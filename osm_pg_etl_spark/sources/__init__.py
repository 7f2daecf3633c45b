from .io import read_table, read_testdata, write_table  # noqa: F401
from .pbf import assemble_linestrings, read_pbf, write_pbf  # noqa: F401
