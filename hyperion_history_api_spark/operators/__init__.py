from .latest_state import latest_row_per_key, first_row_per_key  # noqa: F401
from .asof import asof_join  # noqa: F401
