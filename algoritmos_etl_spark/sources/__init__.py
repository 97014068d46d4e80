from .readers import (  # noqa: F401
    TABLE_NAMES,
    daily_bars,
    load_table,
    load_tables,
    with_event_time,
)
