from lte_cell_scanner_tpu.utils import dsp  # noqa: F401
