from .base import get_head, head_names, normalize_text  # noqa: F401
from . import baseline_head, mpn_head, mhs_head  # noqa: F401  (register heads)
