from mvil_fusion_tpu.utils import lie  # noqa: F401
