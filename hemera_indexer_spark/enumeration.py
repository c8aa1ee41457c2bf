"""Output entity-type selection — which destinations a run materializes.

Analog of the reference's CLI entity bitmask (/root/reference/enumeration/
entity_type.py:101-215: ``calculate_entity_value`` parses a comma list of
entity names into an IntFlag union and ``-E`` selects which output tables
the indexer produces). Here the names resolve to the engine's sink set:

- ``STATE``   — the LWW-merged current-state table (always required; it
  owns the checkpoint manifest).
- ``FACTS``   — the append-only event-history fact table.
- ``EXPORTS`` — range-file export stream (json/csv).
- ``VIEWS``   — incrementally-maintained materialized aggregate
  (the aggr_jobs layer, commit-granular).
- ``DEDUP_INDEX`` — CDC-maintained near-dup signature index over the
  state table (operators/dedup_index.py, commit-granular).
- ``ANN_INDEX`` — CDC-maintained IVF vector index over an embedding
  column of the state table (operators/ivf_index.py, commit-granular).
- ``SEC_INDEX`` — CDC-maintained value->key secondary index over a
  payload column (operators/secondary_index.py, commit-granular).
- ``ALL``     — everything.

``parse_entity_types("state,facts")`` → flags; unknown names raise with
the valid list (the reference raises ValueError the same way)."""

from __future__ import annotations

from enum import IntFlag


class EntityType(IntFlag):
    STATE = 1
    FACTS = 2
    EXPORTS = 4
    VIEWS = 8
    DEDUP_INDEX = 16
    ANN_INDEX = 32
    SEC_INDEX = 64
    CDC_EXPORT = 128
    PQ_INDEX = 256

    ALL = (
        STATE | FACTS | EXPORTS | VIEWS | DEDUP_INDEX | ANN_INDEX
        | SEC_INDEX | CDC_EXPORT | PQ_INDEX
    )


def parse_entity_types(spec: str) -> EntityType:
    """Parse a comma-separated, case-insensitive entity list into flags."""
    flags = EntityType(0)
    for name in spec.split(","):
        name = name.strip().upper()
        if not name:
            continue
        try:
            flags |= EntityType[name]
        except KeyError:
            # __members__ includes the ALL alias; iterating the flag does not
            valid = ", ".join(EntityType.__members__)
            raise ValueError(
                f"unknown entity type {name!r}; valid: {valid}"
            ) from None
    if EntityType.STATE not in flags:
        raise ValueError(
            "STATE is required: the state table owns the checkpoint manifest"
        )
    return flags
