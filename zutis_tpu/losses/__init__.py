from zutis_tpu.losses.criterion import Criterion, criterion_loss  # noqa: F401
