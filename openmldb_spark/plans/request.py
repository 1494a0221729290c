"""Request-mode feature computation — point-in-time features for a
set of REQUEST rows against stored history.

The batch analogue of the reference's online request mode (survey
§3.2; hybridse request-mode RequestUnion plan): each request row
triggers a window over the stored history at its own anchor ts, plus
as-of dimension joins. Where ``plans/backfill.py`` computes the
feature vector at EVERY history row, this computes it only at the
request rows — the serving-path shape (thousands of requests against
10^12 stored turns).

Spark-first realization: the request rows are the emitted primary of
a WINDOW UNION pass whose union side is the history table — exactly
the reference's RequestUnionNode (request row + matching history
window buffered together, only the request row emitted). With
decomposable aggregates the whole plan is the native zero-Python
window-union route; frames never read rows with ts > anchor, so
temporal leakage is impossible by construction.

Request rows are assumed NOT to be part of ``history`` (they are
incoming rows being served); like the reference, the request row
itself participates in its own frame (CURRENT ROW).
"""

from __future__ import annotations

from openmldb_spark.operators.last_join import last_join
from openmldb_spark.operators.window import window_agg
from openmldb_spark.plans.backfill import AsOfSource, FeatureWindow

__all__ = ["request_features"]


def request_features(
    requests,
    history,
    anchor_ts: str,
    windows: list[FeatureWindow],
    asof: list[AsOfSource] | None = None,
):
    """Feature vector at every request row.

    ``requests``/``history`` share the transcript schema (columns the
    history lacks are NULL-padded into frames by the union machinery).
    Multiple requests for the same key are independent anchors — a
    request's frame contains history rows and itself, never other
    request rows (``emit``-flagged union semantics would include them
    only if they were part of ``history``).
    """
    out = requests
    for fw in windows:
        union = [history] + list(fw.union or [])
        if fw.skew:
            from openmldb_spark.operators.skew import window_agg_skewed

            out = window_agg_skewed(
                out, fw.spec, fw.aggs,
                quantiles=fw.skew_quantiles,
                hot_threshold=fw.skew_hot_threshold,
                union=union,
                row_key=fw.row_key,
            )
        else:
            out = window_agg(out, fw.spec, fw.aggs, union=union, impl=fw.impl,
                             row_key=fw.row_key)
    for src in asof or []:
        out = last_join(
            out, src.df, on=src.on, order_by=src.right_ts,
            asof_left_ts=anchor_ts, asof_right_ts=src.right_ts,
            how=src.how, right_prefix=src.prefix,
        )
    return out
