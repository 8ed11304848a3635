"""Event-code flag functions (reference ``main.py:24-42``).

The hit log's ``events`` column is a comma-separated list of numeric
event codes; a named flag is 1 iff its mapped code is an EXACT member
of the list (the reference iterates with ``==`` — code ``'1'`` must
NOT match ``'11'``/``'12'``, so no substring matching here).
``array_contains`` on the split list preserves that exactly, stays
inside whole-stage codegen, and vectorizes.

Flags are integers 0/1 rather than the reference's ``'0'``/``'1'``
strings — its own comment says they're 0/1 "so it can be summed up
later on" (``main.py:35``); ints make that sum native.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# main.py:26-34. 'rfb' is mapped in the reference but never emitted to
# the output dict (dead mapping, SURVEY §1.2); we expose it anyway so
# the full mapping is usable.
EVENT_CODES: dict[str, str] = {
    "order": "1",
    "pdp_view": "2",
    "checkout": "11",
    "atb": "12",
    "rfb": "13",
    "bag": "14",
    "payment": "204",
}

# Output column name per flag; the reference renames 'bag' → 'bag_view'
# in its output dict (main.py:70).
FLAG_COLUMNS: dict[str, str] = {
    "pdp_view": "pdp_view",
    "order": "order",
    "bag": "bag_view",
    "atb": "atb",
    "checkout": "checkout",
    "payment": "payment",
}


def event_flag(events_list: Column, event_name: str) -> Column:
    """1 iff the mapped code for ``event_name`` ∈ ``events_list``."""
    code = EVENT_CODES[event_name]
    return F.array_contains(events_list, code).cast("int")


def all_event_flags(events_list: Column) -> list[Column]:
    """The six flag columns of the reference's hit output (main.py:68-73)."""
    return [
        event_flag(events_list, name).alias(out_name)
        for name, out_name in FLAG_COLUMNS.items()
    ]
