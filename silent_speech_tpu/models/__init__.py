from . import bigru, ctc_model, variants
from .bigru import BiGRUConfig

__all__ = ["bigru", "ctc_model", "variants", "BiGRUConfig"]
