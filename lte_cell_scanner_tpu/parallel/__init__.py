from lte_cell_scanner_tpu.parallel.sharded_search import (  # noqa: F401
    sharded_xcorr_pss,
    make_search_mesh,
)
