from zutis_tpu.models.zutis import ZUTIS  # noqa: F401
from zutis_tpu.models.vit import CLIPViT  # noqa: F401
from zutis_tpu.models.text import CLIPTextEncoder  # noqa: F401
