from .maps import tag_get, tag_has, explode_tags  # noqa: F401
from .arrays import get_ints_from_text, first_int, array_first, array_last, array_reverse  # noqa: F401
from .geo import (  # noqa: F401
    haversine_km,
    linestring_length_km,
    point,
    point_wkt,
    linestring_wkt,
    make_line,
    snap_to_grid,
)
from .hashing import md5_long, md5_hex  # noqa: F401
