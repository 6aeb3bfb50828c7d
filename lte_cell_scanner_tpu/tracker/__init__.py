from lte_cell_scanner_tpu.tracker.runtime import LTETracker  # noqa: F401
from lte_cell_scanner_tpu.tracker.state import (  # noqa: F401
    GlobalState,
    TrackedCell,
)
