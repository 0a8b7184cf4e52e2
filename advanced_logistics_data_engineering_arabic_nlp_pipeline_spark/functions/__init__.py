from .coercion import (  # noqa: F401
    coerce_double,
    coerce_long,
    coerce_string,
    coerce_timestamp,
    dsum,
)
from .scalars import (  # noqa: F401
    conditional_distance,
    extract_plate,
    route_string,
    us_date_string,
)
