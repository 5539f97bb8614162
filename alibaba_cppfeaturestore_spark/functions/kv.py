"""Ali-CCP key-value feature-list parsing — native column expressions.

The reference parses ``feat_list`` strings of the form

    field_id \\x02 feat_id \\x03 feat_val [\\x01 field_id \\x02 feat_id \\x03 feat_val]...

with a row-at-a-time Python UDF + NumPy stride tricks
(``data_processing/batch_processing/batch_process_Bronze_to_Silver.py:69-84``),
keeping token positions 0 (field_id) and 1 (feat_id) of each triplet and
dropping feat_val. That UDF crosses the JVM→Python boundary per row; here the
same semantics are pure Catalyst expressions (split + lambda filter +
map_from_arrays) that stay inside whole-stage codegen — no Python worker.

Merge semantics (``merge_feature_maps``) replicate Python ``dict.update``:
the *right-most* map wins on key collisions (reference ``:80-82`` — common
features override skeleton features). Conf-independent: works under any
``spark.sql.mapKeyDedupPolicy`` (duplicates are filtered before concat).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Control-byte separators of the Ali-CCP encoding (reference :70-73).
KV_SPLIT_REGEX = "[\x01\x02\x03]"


def parse_kv_triplets(feat_list: Column | str) -> Column:
    """Parse an Ali-CCP feat_list string into ``map<string,string>``.

    Equivalent to the reference's ``process_csv_line`` UDF
    (``batch_process_Bronze_to_Silver.py:69-73``): splits on the three
    control bytes, then takes every (3i)-th token as key (field_id) and
    every (3i+1)-th token as value (feat_id); feat_val (3i+2) is dropped.

    Pure column expression — JVM-side, codegen-friendly, no Python UDF.
    """
    col = F.col(feat_list) if isinstance(feat_list, str) else feat_list
    toks = F.split(col, KV_SPLIT_REGEX)
    keys = F.filter(toks, lambda _, i: i % 3 == 0)
    vals = F.filter(toks, lambda _, i: i % 3 == 1)
    # Malformed/empty input yields ragged key/value arrays (split("") is
    # [""], so keys=[""] but vals=[]); keep only complete triplets so
    # map_from_arrays never sees mismatched lengths.
    n = F.least(F.size(keys), F.size(vals))
    return F.map_from_arrays(F.slice(keys, 1, n), F.slice(vals, 1, n))


def merge_feature_maps(*maps: Column) -> Column:
    """Merge feature maps, last-wins on duplicate keys (dict.update order).

    Reference semantics: ``feat_dict.update(value_dict)`` lets the common
    feature map override the skeleton map
    (``batch_process_Bronze_to_Silver.py:80-82``). Pass maps in increasing
    priority order. NULL maps are treated as empty so a LEFT-join miss on
    the common side does not null out the whole merged map.

    Session-conf-independent: duplicate keys are removed from the
    lower-priority side *before* ``map_concat``, so the merge works under any
    SparkSession regardless of ``spark.sql.mapKeyDedupPolicy`` (the default
    EXCEPTION policy throws DUPLICATED_MAP_KEY when map_concat sees a key
    twice).
    """
    safe = [
        F.coalesce(m, F.from_json(F.lit("{}"), "map<string,string>")) for m in maps
    ]
    merged = safe[0]
    for nxt in safe[1:]:
        # Keys present in the higher-priority map shadow the accumulator, so
        # map_concat never sees a duplicate key under any dedup policy.
        merged = F.map_concat(
            F.map_filter(merged, lambda k, _v: ~F.map_contains_key(nxt, k)),
            nxt,
        )
    return merged


def labels_map(click: Column, conversion: Column) -> Column:
    """Build the ``{"click": c, "conversion": v}`` label map injected by the
    reference's skeleton UDF (``batch_process_Bronze_to_Silver.py:82-84``)."""
    return F.create_map(
        F.lit("click"), click.cast("string"), F.lit("conversion"), conversion.cast("string")
    )
