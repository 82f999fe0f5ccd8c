"""Connected components over near-duplicate pair graphs.

The missing last step of every dedup pipeline: pair generators
(``dedup.ngram_jaccard_pairs``, ``minhash_lsh_pairs``,
``similarity.cosine_dup_pairs_lsh``) emit edges, but a training-data
pipeline must then pick ONE canonical document per duplicate *cluster*
— near-duplication is transitive in practice (A~B, B~C ⇒ drop two of
{A,B,C}), so the unit of deduplication is the connected component of
the pair graph, not the pair.

Reference parity: Miru has no graph step (its dedupe is the versioned
REPAIR upsert, ``MiruIndexer.java:128-162``); this operator belongs to
the LLM-pipeline extension surface alongside the pair generators.

Scale design (the interesting part):

- **Min-label propagation + pointer jumping.** Each iteration does two
  joins: (1) every node takes the min label over its neighbors
  (shuffle keyed on node id — uniform, since ids are arbitrary), then
  (2) a path-shortcut ``label := label(label)`` (pointer jump). Plain
  propagation needs O(diameter) rounds; the jump halves remaining path
  lengths, giving O(log d) rounds. Near-dup components are dense and
  tiny (d ≤ 3-4 is typical), so 3-5 rounds close real corpora.
- **Monotone convergence check.** Labels only ever decrease, so
  ``sum(label)`` strictly decreases until the fixpoint; one cheap
  aggregate per round replaces a changed-rows join. No collect of the
  label table ever happens.
- **Lineage truncation.** Each round's label table is
  ``localCheckpoint``-ed: without it the plan doubles per iteration
  and the DAG scheduler, not the data, becomes the bottleneck. (The
  same pattern GraphX/GraphFrames uses internally.)
- **No driver-side graph.** Components of any size stay distributed;
  the giant-component pathology (one boilerplate string linking
  millions of docs) produces a skewed min-label key only at the final
  groupBy, which AQE's skew handling splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame, id_a: str, id_b: str) -> DataFrame:
    e = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``.

    ``component`` is the minimum node id of the node's connected
    component — stable, deterministic, and meaningful (the canonical
    survivor under keep-lowest-id policy).
    """
    und = _undirected(edges, id_a, id_b).localCheckpoint()
    labels = (
        und.select("src").distinct()
        .select(F.col("src").alias("id"), F.col("src").alias("label"))
        .localCheckpoint()
    )
    # convergence metric: count of labels that moved this round — NOT
    # sum(label), which overflows long under ANSI mode once ids are
    # large (composite/shifted id spaces put ids near 2^61; a few
    # million of those cannot be summed into one long)
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "id")
        )
        stepped = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("_old"),  # round-start label
            )
        )
        # pointer jump: label := label(label). Min-propagation keeps every
        # label a live node id, so the self-join always resolves.
        jumped = (
            stepped.alias("s")
            .join(
                stepped.select(
                    F.col("id").alias("jid"), F.col("label").alias("jlabel")
                ),
                F.col("s.label") == F.col("jid"),
                "left",
            )
            .select(
                F.col("s.id").alias("id"),
                F.least(
                    F.col("s.label"), F.coalesce(F.col("jlabel"), F.col("s.label"))
                ).alias("label"),
                (
                    F.least(
                        F.col("s.label"),
                        F.coalesce(F.col("jlabel"), F.col("s.label")),
                    )
                    < F.col("s._old")
                ).alias("_moved"),
            )
        )
        moved_and_labels = jumped.localCheckpoint()
        n_moved = (
            moved_and_labels.agg(
                F.sum(F.col("_moved").cast("long")).alias("n")
            ).first()["n"]
            or 0
        )
        labels = moved_and_labels.drop("_moved", "_old")
        if n_moved == 0:
            break
    return labels.select("id", F.col("label").alias("component"))


def canonical_docs(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(doc_id, canonical_id, is_kept) for every node in the pair graph.

    ``canonical_id`` = min doc id of the component; ``is_kept`` marks
    the one survivor per cluster. Docs with no near-dup edge are their
    own canonical trivially and are not emitted (join the mapping back
    with a left join + coalesce to filter a corpus).
    """
    comp = connected_components(edges, id_a, id_b, max_iter)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        (F.col("id") == F.col("component")).alias("is_kept"),
    )


def dedup_corpus(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The corpus with every non-canonical near-duplicate dropped."""
    mapping = canonical_docs(edges, id_a, id_b)
    return (
        docs.join(
            mapping.where(~F.col("is_kept")).select(
                F.col("doc_id").alias(id_col)
            ),
            id_col,
            "left_anti",
        )
    )


def survivor_docs(
    edges: DataFrame,
    quality: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    quality_id: str = "id",
    quality_col: str = "quality",
    max_iter: int = 20,
) -> DataFrame:
    """(doc_id, survivor_id) — quality-aware canonical pick per cluster.

    ``canonical_docs`` keeps the LOWEST id of each duplicate component
    (stable, but blind); real pipelines keep the BEST member — the one
    with the highest quality score, ties broken by lowest id. One
    ``max_by`` aggregation per component replaces a window: ``struct``
    comparison is lexicographic, so ``max_by(id, (q, -id))`` is exactly
    (quality desc, id asc). A giant component is one skewed groupBy key;
    AQE's skew handling splits the partial aggregation.
    """
    comp = connected_components(edges, id_a, id_b, max_iter)
    # LEFT join: a member with no quality row stays in its cluster's map
    # (it must still be deduplicated) — it just can't win. coalesce to
    # -inf keeps the max_by key total without dropping rows.
    j = comp.join(
        quality.select(
            F.col(quality_id).alias("id"), F.col(quality_col).alias("q")
        ),
        "id",
        "left",
    ).withColumn("q", F.coalesce(F.col("q"), F.lit(float("-inf"))))
    # min over (-q, id): highest quality, ties to the LOWEST id — the
    # min_by form (not max_by with -id) keeps the tiebreak valid for
    # STRING doc ids, which every other components function supports
    surv = j.groupBy("component").agg(
        F.expr("min_by(id, struct(-q, id))").alias("survivor_id")
    )
    return (
        j.join(surv, "component")
        .select(F.col("id").alias("doc_id"), "survivor_id")
    )
