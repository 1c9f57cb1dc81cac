"""Link-graph analytics: PageRank-style domain authority.

A corpus curation pipeline ranks SOURCES, not just documents: domain
authority (PageRank over the citation/link graph) is a classic quality
prior for sampling weights. The graph here is derived deterministically
from the corpus itself — an edge (corpus source → mentioned URL domain)
per distinct mention, built with the same augmented-docs URL extraction
as url_domain_stats so the DuckDB oracle sees the identical graph.

Scale shape (the reason PageRank is THE canonical distributed-iteration
benchmark): the rank table stays node-keyed, every iteration is one
shuffle join of ranks against the out-degree-weighted edge list plus one
dst-keyed aggregate, and the iterate state is lineage-cut per round
(localCheckpoint here; reliable checkpoint() on a lossy cluster) exactly
like dedup_clusters / kmeans_refined_clusters. Dangling-node mass is
dropped (not redistributed) — the standard simplification, identical in
both engines, so ranks are comparable, not a probability distribution.

FP parity with the oracle: per-edge contributions are rounded to 9
decimals before the sum and every rank is re-rounded per iteration (the
kmeans centroid trick), so 3 iterations stay hash-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.operators.refs import _AUG_SQL, URL_PATTERN, augmented_docs
from reddit_sentiment_spark_streaming_pipeline_spark.functions.text import explode_clean
from reddit_sentiment_spark_streaming_pipeline_spark.registry import register

DAMPING = 0.85
PR_ITERS = 3

_EDGES_SQL = f"""
        aug AS ({_AUG_SQL}),
        urls AS (
            SELECT source, unnest(regexp_extract_all(text_aug, 'https?://[^\\s]+')) AS url
            FROM aug
        ),
        edges AS (
            SELECT DISTINCT source AS src,
                   regexp_extract(url, '^https?://([^/]+)', 1) AS dst
            FROM urls
        ),
        nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        ncount AS (SELECT count(*) AS nn FROM nodes),
        outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
        edges_w AS (SELECT e.src, e.dst, o.od FROM edges e JOIN outdeg o USING (src)),
        r0 AS (
            SELECT node, round(1.0 / (SELECT nn FROM ncount), 9) AS rank
            FROM nodes
        )
"""


def _pr_iter_sql(i: int) -> str:
    return f"""
    c{i} AS (
        SELECT e.dst AS node, sum(round(r.rank / e.od, 9)) AS s
        FROM edges_w e JOIN r{i - 1} r ON r.node = e.src
        GROUP BY e.dst
    ),
    r{i} AS (
        SELECT n.node,
               round({1 - DAMPING} / (SELECT nn FROM ncount)
                     + {DAMPING} * coalesce(c.s, 0), 9) AS rank
        FROM nodes n LEFT JOIN c{i} c USING (node)
    )"""


@register(
    "domain_pagerank",
    oracle=f"""
    WITH {_EDGES_SQL},
    {",".join(_pr_iter_sql(i) for i in range(1, PR_ITERS + 1))}
    SELECT node, rank FROM r{PR_ITERS}
    ORDER BY rank DESC, node
    """,
    doc=f"PageRank (damping {DAMPING}, {PR_ITERS} iterations) over the "
    "source→domain link graph: the domain-authority quality prior a "
    "corpus pipeline samples by. Each iteration is one node-keyed "
    "shuffle join + dst aggregate with a per-round lineage cut; the "
    "oracle replays the identical iterations as chained CTEs.",
)
def domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = augmented_docs(spark, sf_dir)
    ugen, ukeep = explode_clean(
        F.regexp_extract_all("text_aug", F.lit(URL_PATTERN), F.lit(0)), "url"
    )
    urls = docs.select("source", ugen).filter(ukeep)
    edges = urls.select(
        F.col("source").alias("src"),
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("dst"),
    ).distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # scalar N as a broadcast frame, not a driver collect
    ncount = nodes.agg(F.count(F.lit(1)).alias("nn"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    # out-degree folded into the edge list ONCE; checkpointed so every
    # iteration rereads materialized partitions instead of re-deriving
    # the graph (the dedup_clusters lineage rule)
    edges_w = edges.join(outdeg, "src").localCheckpoint()
    nodes = nodes.localCheckpoint()

    ranks = nodes.crossJoin(F.broadcast(ncount)).select(
        "node", F.round(F.lit(1.0) / F.col("nn"), 9).alias("rank")
    ).localCheckpoint()
    for _ in range(PR_ITERS):
        contribs = (
            edges_w.join(ranks, edges_w.src == ranks.node)
            .select("dst", F.round(F.col("rank") / F.col("od"), 9).alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(ncount))
            .join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                F.round(
                    (1 - DAMPING) / F.col("nn")
                    + DAMPING * F.coalesce(F.col("s"), F.lit(0.0)),
                    9,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.orderBy(F.desc("rank"), "node")
