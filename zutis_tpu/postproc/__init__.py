from zutis_tpu.postproc.instance import (  # noqa: F401
    predict_semantic,
    predict_instances_device,
    instances_to_coco,
)
