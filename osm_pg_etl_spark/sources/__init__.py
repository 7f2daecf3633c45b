from .io import read_table, read_testdata, write_table  # noqa: F401
