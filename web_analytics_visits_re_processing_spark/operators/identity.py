"""Cross-device identity stitching — the web-analytics operator the
reference's visitors feed points at but never performs.

The reference emits one ``(user_id, ibm_id, scv_id)`` row per hit
(reference ``main.py:106`` visitors sink) and stops; the analysis
that feed exists FOR is identity resolution: when two device-level
user ids share a durable identifier (login id, email hash, CRM id),
they are the same visitor, and transitive links (phone shares a
login with laptop, laptop shares a cookie with tablet) must collapse
into one canonical visitor. That is connected components over the
user↔identifier bipartite graph.

Scale shape:

- the bipartite graph is never pair-exploded: users sharing an
  identifier are star-reduced to ``(min_user, user)`` edges via ONE
  window over the identifier partition — an identifier shared by n
  users contributes n-1 edges, not n², and the components are
  identical (the star is connected);
- **promiscuous-identifier guard**: identifiers linking more than
  ``max_share`` users are dropped BEFORE edge construction. This is
  standard identity-resolution practice, not a shortcut — a shared
  proxy cookie or bot fingerprint would otherwise weld thousands of
  real visitors into one mega-component (and its window partition is
  the whale key);
- transitive closure runs on the existing large-star/small-star
  machinery (``operators/graph.py::connected_components``,
  O(log diameter) rounds, lineage checkpoint-truncated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.operators.graph import (
    connected_components,
)


def stitch_identities(
    id_map: DataFrame,
    user_col: str = "user_id",
    ident_col: str = "ident",
    max_share: int = 16,
) -> DataFrame:
    """``(user, identifier)`` link table → ``(user, canonical_visitor,
    n_devices)``: transitive closure over shared identifiers, with the
    component minimum as the canonical visitor id and ``n_devices``
    the stitched component's size (1 for unlinked users)."""
    # r13: links feeds the edge window AND the node set (and through
    # them the CC loop's eager init) — each reference replayed the
    # caller's id_map build; checkpoint the bounded link table once.
    links = id_map.select(user_col, ident_col).distinct().localCheckpoint(
        eager=True
    )
    w = Window.partitionBy(ident_col)
    edges = (
        links.withColumn("_mn", F.min(user_col).over(w))
        .withColumn("_cnt", F.count(F.lit(1)).over(w))
        .where((F.col("_cnt") <= max_share) & (F.col(user_col) != F.col("_mn")))
        .select(F.col("_mn").alias("id_a"), F.col(user_col).alias("id_b"))
        .distinct()
    )
    users = links.select(user_col).distinct()
    comp = connected_components(users, edges, node_col=user_col)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_devices")
    )
    return comp.join(sizes, "component").select(
        user_col,
        F.col("component").alias("canonical_visitor"),
        "n_devices",
    )
