"""Event-sourced entity state replay (SURVEY.md §1.1, §2.9 F6).

The reference reconstructs historical bug states by applying *reverse*
field-diffs to the current state, newest-first
(webcompat_kb/etl/metric_changes.py:186-314: each history entry holds
``changes: [{field_name, added, removed}]``; replaying backwards sets
field := removed).

Spark-first formulation: one groupBy(entity) collects the ordered
change log, then a single ``aggregate`` higher-order fold walks it
newest→oldest, emitting the state that was true *before* each change.
State is a map<string,string>; the fold is JVM expressions
(map_concat / map_filter), no Python in the loop. The shuffle is the
one unavoidable per-entity grouping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _apply_reverse(state: Column, changes: Column) -> Column:
    """State before a change-set: for each field change, field := removed."""
    reverse_map = F.map_from_entries(
        F.transform(
            changes,
            lambda c: F.struct(
                c["field_name"].alias("key"), c["removed"].alias("value")
            ),
        )
    )
    # map_concat with duplicate keys keeps the LAST occurrence under
    # spark.sql.mapKeyDedupPolicy=LAST_WIN; do an explicit overwrite
    # (filter out overridden keys first) so behaviour is policy-free.
    kept = F.map_filter(state, lambda k, _v: ~F.array_contains(F.map_keys(reverse_map), k))
    return F.map_concat(kept, reverse_map)


def replay_states(
    current: DataFrame,
    history: DataFrame,
    entity_col: str = "number",
    time_col: str = "change_time",
    changes_col: str = "changes",
    state_col: str = "state",
    time_type: str = "timestamp_ntz",
) -> DataFrame:
    """Reconstruct per-entity historical states from reverse diffs.

    Parameters
    ----------
    current:
        One row per entity with ``state_col``: map<string,string> —
        the present-day field values.
    history:
        Change events: (entity, time, changes array<struct<field_name,
        added, removed>>).

    Returns one row per (entity, change_time) holding the state that
    was in effect *immediately before* that change — the reference's
    ``states at each historical timestamp`` output
    (metric_changes.py:228-314).
    """
    packed = history.select(
        F.col(entity_col),
        F.struct(F.col(time_col).alias("t"), F.col(changes_col).alias("ch")).alias("ev"),
    )
    # newest-first ordered log per entity
    log = packed.groupBy(entity_col).agg(
        F.reverse(F.sort_array(F.collect_list("ev"))).alias("log")
    )
    joined = current.join(log, entity_col, "inner")

    # Fold newest→oldest: acc is array<struct<t, state>>; each step
    # applies the reverse diff to the previous state (the state after
    # acc's last element's change was un-applied).
    def step(acc: Column, ev: Column) -> Column:
        prev_state = F.element_at(acc, -1)["state"]
        new_state = _apply_reverse(prev_state, ev["ch"])
        return F.concat(
            acc,
            F.array(F.struct(ev["t"].alias("t"), new_state.alias("state"))),
        )

    seeded = F.array(
        F.struct(
            F.lit(None).cast(time_type).alias("t"),
            F.col(state_col).alias("state"),
        )
    )
    folded = joined.select(
        F.col(entity_col),
        F.aggregate(F.col("log"), seeded, step).alias("trail"),
    )
    # Drop the seed element (current state, t=null); each remaining
    # element is the state before the change at time t.
    exploded = folded.select(
        entity_col,
        F.explode(F.slice(F.col("trail"), 2, F.size(F.col("trail")) - 1)).alias("s"),
    )
    return exploded.select(
        entity_col,
        F.col("s.t").alias(time_col),
        F.col("s.state").alias("state_before"),
    )


def change_reasons(
    changes: Column,
    status_field: str = "status",
    fixed_states: tuple[str, ...] = ("purchase",),
    field_reasons: dict[str, str] | None = None,
) -> Column:
    """Classify a change-set into sorted, de-duplicated reason tags —
    the reference's ``get_change_reasons``
    (etl/metric_changes.py:415-447: url → url-updated, cf_user_story
    → triage, status crossing FIXED_STATES → resolved/reopened;
    reasons are set-collected then sorted).

    ``changes`` is the replay change array (field_name, added,
    removed). Status transitions INTO ``fixed_states`` map to
    'resolved', OUT of them to 'reopened'; other fields map through
    ``field_reasons``; unmatched changes contribute nothing. Pure
    JVM expressions (transform → filter → distinct → sort).
    """
    field_reasons = dict(field_reasons or {})
    fixed = [F.lit(s) for s in fixed_states]

    def one(c: Column) -> Column:
        status = (
            F.when(
                c["added"].isin(*fixed) & ~c["removed"].isin(*fixed),
                F.lit("resolved"),
            )
            .when(
                c["removed"].isin(*fixed) & ~c["added"].isin(*fixed),
                F.lit("reopened"),
            )
            .otherwise(F.lit(None).cast("string"))
        )
        other = F.lit(None).cast("string")
        for fname, reason in sorted(field_reasons.items()):
            other = F.when(c["field_name"] == fname, F.lit(reason)).otherwise(
                other
            )
        return F.when(c["field_name"] == status_field, status).otherwise(other)

    tagged = F.transform(changes, one)
    return F.array_sort(
        F.array_distinct(F.filter(tagged, lambda r: r.isNotNull()))
    )
