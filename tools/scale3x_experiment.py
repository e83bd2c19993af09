"""Second scaling point for the dedup/similarity family (round 5).

SCALE.md's measured table covers sf0.01 → sf0.1 (10× rows). This experiment
adds a 3× point ABOVE sf0.1 without synthesizing new driver inputs: it
builds a corpus of three structurally-identical, mutually-disjoint copies of
the sf0.1 tables in a scratch dir and times the fuzzy-dedup scale paths on
1× vs 3×.

Construction keeps the per-copy similarity structure EXACTLY that of sf0.1
while making cross-copy pairs non-similar, so true-pair mass and bucket
populations scale exactly 3× — the cleanest possible linearity probe:

- documents: every whitespace token in copy i>0 is prefixed with ``c{i}·``
  (token sets of different copies are disjoint ⇒ MinHash/SimHash signatures
  decorrelate; within a copy, Jaccard structure is untouched).
- embeddings: copy i>0 applies a fixed dimension permutation (norms and
  within-copy cosines are exactly preserved; cross-copy cosines drop to
  near-isotropic noise).

A linear-ish operator on a not-yet-saturated local[32] should show ≤3× wall
time at 3× rows; ≥9× would flag quadratic cross-copy work (banding failing
to separate the copies).

Usage: python tools/scale3x_experiment.py [sf_dir] [n_copies] [op,op,…]
(defaults /root/testdata/sf0.1, 3 — pass 10 for a second decade above
sf0.1: 50 000 documents / 20 000 embeddings, true-pair mass exactly 10×)

The optional third argument restricts to a comma-separated operator subset —
points far above 10× exclude the operators whose OUTPUT mass is quadratic in
the copy count by construction (minhash/simhash/embedding chance pairs ∝
C(N,2), basket_pairs' within-order expansion): at N=100 their pair
materialization alone is hundreds of millions of rows, measuring allocator
throughput rather than the operator. The sublinear/bounded families are the
ones whose 100 TB posture the extra decade actually probes.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import etl_ecommerce_data_spark.operators.dedup as DD
import etl_ecommerce_data_spark.operators.similarity as SIM
from etl_ecommerce_data_spark.session import get_spark
from etl_ecommerce_data_spark.sources.registry import load_table

SCRATCH = "/tmp/spark_graft_scale3x"
ID_STRIDE = 10_000_000


def _max_copies(dim: int) -> int:
    """Largest decorrelated embedding copy count: the base copy plus one per
    distinct coprime residue mod ``dim`` (phi(dim); 1 when dim == 1)."""
    import math

    avail = sum(1 for r in range(dim) if math.gcd(r, dim) == 1) if dim > 1 else 1
    return avail + 1


def _strides(n_copies: int, dim: int) -> list[int]:
    """One coprime stride per non-base copy, all DISTINCT: two copies
    sharing a stride (a gcd bump can collide adjacent candidates for dims
    divisible by a candidate, e.g. dim=51 bumps 17 → 19 = the next copy's)
    would make their permutations index-rotations of each other — perfectly
    correlated cross-copy cosines, defeating the disjoint-copy
    construction."""
    import itertools
    import math

    # BOUNDED scan (driver ADVICE r6): there are only phi(dim) coprime
    # residues mod dim, so requesting more distinct strides than that can
    # never terminate (e.g. dim=1, where every s % dim == 0) — fail loudly
    # up front instead of spinning in itertools.count.
    avail = _max_copies(dim) - 1
    if n_copies - 1 > avail:
        raise ValueError(
            f"n_copies={n_copies} needs {n_copies - 1} distinct coprime "
            f"residues mod dim={dim}, only {avail} exist"
        )
    # candidate order preserves the round-5/6 measurements: copies 1 and 2
    # keep their historical strides (17, 29) on the shipped dim=64 corpus
    candidates = itertools.chain([17, 29], itertools.count(31, 2))
    out: list[int] = []
    scanned_since_add = 0
    for s in candidates:
        if len(out) >= n_copies - 1:
            break
        if math.gcd(s, dim) == 1 and s % dim not in [x % dim for x in out]:
            out.append(s)
            scanned_since_add = 0
        else:
            scanned_since_add += 1
            # every residue class mod dim recurs within 2*dim consecutive
            # odd candidates; no progress in that span means no usable
            # residue remains despite the phi bound — fail, don't spin
            if scanned_since_add > 2 * dim:
                raise RuntimeError(
                    f"stride scan stalled: {len(out)} of {n_copies - 1} "
                    f"strides found for dim={dim}"
                )
    return out


def _perm(stride: int, copy_i: int, dim: int) -> list[int]:
    """Affine permutation of ``dim`` dimensions for copy ``copy_i``, using a
    pre-assigned unique coprime ``stride`` (see ``_strides``)."""
    return [(stride * j + 5 * copy_i) % dim for j in range(dim)]


def build_nx(spark, sf_dir: str, n_copies: int) -> str:
    out = os.path.join(SCRATCH, f"{n_copies}x")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents")
    copies = [docs]
    for i in range(1, n_copies):
        prefixed = F.array_join(
            F.transform(F.split(F.col("text"), " "), lambda x: F.concat(F.lit(f"c{i}·"), x)),
            " ",
        )
        copies.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * ID_STRIDE))
            .withColumn("text", prefixed)
        )
    d_all = copies[0]
    for c in copies[1:]:
        d_all = d_all.unionByName(c)
    d_all.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    # the decorrelating permutation family is exhausted at phi(dim)+1
    # copies; past that, replicate embeddings only up to the bound (points
    # that far up measure the non-embedding families — main() refuses to
    # time an embedding operator beyond this)
    e_copies = min(n_copies, _max_copies(dim))
    if e_copies < n_copies:
        print(
            f"note: embeddings replicated {e_copies}x (stride bound "
            f"phi({dim})+1), documents/relational/events {n_copies}x"
        )
    strides = _strides(e_copies, dim)
    ecopies = [emb]
    for i in range(1, e_copies):
        permuted = F.array(
            *[F.get(F.col("embedding"), p) for p in _perm(strides[i - 1], i, dim)]
        )
        ecopies.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * ID_STRIDE))
            .withColumn("embedding", permuted)
        )
    e_all = ecopies[0]
    for c in ecopies[1:]:
        e_all = e_all.unionByName(c)
    e_all.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))

    # Relational tables for the analytics-mart scaling rows (round 7): key
    # columns stride by copy, every other column is untouched — so each
    # copy is a disjoint, structurally-identical mini-warehouse. Predicted
    # output under N copies: per-customer marts (customer_metrics) emit
    # exactly N× rows; per-day marts (daily_sales) keep their row count and
    # scale every additive aggregate by exactly N — both checkable, like
    # the dedup construction's true-pair mass.
    keyed = {
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey"],
        "customer": ["c_custkey"],
    }
    for tname, keys in keyed.items():
        t = load_table(spark, sf_dir, tname)
        tcopies = [t]
        for i in range(1, n_copies):
            c = t
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * ID_STRIDE))
            tcopies.append(c)
        t_all = tcopies[0]
        for c in tcopies[1:]:
            t_all = t_all.unionByName(c)
        t_all.write.mode("overwrite").parquet(os.path.join(out, f"{tname}.parquet"))

    # UNSCALED dimension tables for the wide-mart scaling rows (round 9):
    # part and supplier are staged 1× — the production shape at 100 TB is
    # facts growing ~linearly while dims stay near-constant, so the N-copy
    # lineitems (l_partkey/l_suppkey untouched by the key striding) all
    # join the SAME dim rows: mart row counts hold constant while every
    # additive aggregate scales exactly N×.
    for tname in ("part", "supplier"):
        load_table(spark, sf_dir, tname).write.mode("overwrite").parquet(
            os.path.join(out, f"{tname}.parquet")
        )

    # events for the STREAMING scaling rows (round 8): event_id/user_id
    # stride by copy, ts/event_type/value/props untouched — each copy is a
    # disjoint user population replaying the identical event timeline.
    # Written as ONE parquet FILE via pyarrow (not a Spark part-file
    # directory): read_events_stream's pathGlobFilter matches the literal
    # leaf name `events.parquet`, and a single file also keeps the
    # maxFilesPerTrigger=1 micro-batch structure identical between the 1x
    # and Nx runs (one batch each — the wall ratio measures per-batch
    # throughput, not batch-count overhead). pyarrow preserves the source
    # ts encoding; the stream reader's kind probe handles either.
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    eparts = [ev]
    for i in range(1, n_copies):
        e2 = ev.set_column(
            ev.schema.get_field_index("event_id"), "event_id",
            pc.add(ev["event_id"], i * ID_STRIDE),
        )
        e2 = e2.set_column(
            e2.schema.get_field_index("user_id"), "user_id",
            pc.add(e2["user_id"], i * ID_STRIDE),
        )
        eparts.append(e2)
    pq.write_table(pa.concat_tables(eparts), os.path.join(out, "events.parquet"))
    return out


def timed(fn, runs: int = 3) -> tuple[float, int]:
    best, n = float("inf"), -1
    for _ in range(runs):
        t0 = time.perf_counter()
        n = fn()
        best = min(best, time.perf_counter() - t0)
    return best, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    picked = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    spark = get_spark("scale3x")
    # refuse an un-measurable embedding run BEFORE building the N× corpus:
    # past the permutation-family bound, cross-copy cosines would be
    # correlated and the embedding timing meaningless
    dim0 = len(
        load_table(spark, sf_dir, "embeddings").select("embedding").first()["embedding"]
    )
    if n_copies > _max_copies(dim0) and (picked is None or "embedding_near_dup" in picked):
        raise SystemExit(
            f"embedding_near_dup is not measurable at {n_copies}x: the "
            f"decorrelating permutation family ends at {_max_copies(dim0)} "
            "copies (cross-copy cosines would be correlated) — pass an "
            "operator subset without it"
        )
    tdir = build_nx(spark, sf_dir, n_copies)

    def inputs(d):
        return load_table(spark, d, "documents").cache(), load_table(
            spark, d, "embeddings"
        ).cache()

    d1, e1 = inputs(sf_dir)
    d3, e3 = inputs(tdir)
    print(f"rows: documents {d1.count()} -> {d3.count()}, embeddings {e1.count()} -> {e3.count()}")

    def cross(d, e, sdir):
        is_new = F.col("source").isin("src0", "src1")
        return DD.minhash_lsh_pairs_cross(
            d.filter(is_new), d.filter(~is_new), threshold=0.6
        ).count()

    def linkage(d, e, sdir):
        from etl_ecommerce_data_spark.operators.linkage import blocked_levenshtein_pairs

        heads = d.select("doc_id", F.substring("text", 1, 120).alias("head"))
        return blocked_levenshtein_pairs(
            heads, "doc_id", "head", n_block_tokens=2, max_distance=20, max_block_size=1000
        ).count()

    def boilerplate(d, e, sdir):
        return DD.boilerplate_removal(d, chunk_tokens=8, min_docs=3).count()

    def cc_graph(d, e, sdir):
        # CC-isolated 100x point for duplicate clustering (VERDICT r9
        # residual #7): the full dedup_clusters chain is subject to the
        # quadratic-chance-pair subset rule — its minhash input's chance
        # mass (∝ C(N,2)) dominates above ~30x, measuring the allocator,
        # not the operator. This op moves build_nx's copy-disjoint
        # construction to the EDGE level instead: the 1x LSH pair graph is
        # computed ONCE from the base corpus, then nodes and edges are
        # replicated with the same id stride documents get — chance mass
        # cannot enter, components cannot span copies, and the iteration
        # count is per-copy structure, so label propagation itself is the
        # only thing the N-x wall can measure. Staged to parquet on first
        # call; timed(best-of-3) reports the post-staging runs.
        tag = "1x" if sdir == sf_dir else f"{n_copies}x"
        gdir = os.path.join(SCRATCH, f"ccgraph_{tag}")
        edges_p, nodes_p = os.path.join(gdir, "edges"), os.path.join(gdir, "nodes")
        # staging-complete gate is on BOTH leaf _SUCCESS markers, not gdir
        # existence (ADVICE r10 #3: a retry in the same process after a
        # death between the edges and nodes writes would otherwise read a
        # half-staged graph and report a silently wrong CC row); staging
        # lands in a temp dir renamed into place so gdir is all-or-nothing
        if not all(
            os.path.exists(os.path.join(p, "_SUCCESS")) for p in (edges_p, nodes_p)
        ):
            tmp = gdir + ".staging"
            for stale_dir in (gdir, tmp):  # not 'd' — that's the docs frame
                shutil.rmtree(stale_dir, ignore_errors=True)
            base = load_table(spark, sf_dir, "documents")
            pairs = DD.minhash_lsh_pairs(base, threshold=0.6)
            k = 1 if tag == "1x" else n_copies
            offs = spark.range(k).select((F.col("id") * ID_STRIDE).alias("off"))
            pairs.select("doc_a", "doc_b").crossJoin(F.broadcast(offs)).select(
                (F.col("doc_a") + F.col("off")).alias("doc_a"),
                (F.col("doc_b") + F.col("off")).alias("doc_b"),
            ).write.parquet(os.path.join(tmp, "edges"))
            base.select("doc_id").crossJoin(F.broadcast(offs)).select(
                (F.col("doc_id") + F.col("off")).alias("doc_id")
            ).write.parquet(os.path.join(tmp, "nodes"))
            os.rename(tmp, gdir)
        return DD.connected_components(
            spark.read.parquet(edges_p), spark.read.parquet(nodes_p), node_col="doc_id"
        ).count()

    def hygiene(d, e, sdir):
        # the composed redact -> boilerplate -> quality -> dedup pipeline
        # (round-6 third scaling point, VERDICT r5 ask #6) — the registry
        # builder itself, run against the 1x / 3x directory
        from etl_ecommerce_data_spark.plans.queries import QUERIES

        return QUERIES["curate_corpus_hygiene"].builder(spark, sdir).count()

    def registry(name):
        # registry builders run against the 1x / Nx directory directly —
        # the same code path the driver measures
        from etl_ecommerce_data_spark.plans.queries import QUERIES

        return lambda d, e, sdir: QUERIES[name].builder(spark, sdir).count()

    def registry_sum(name, col):
        # like registry(), but the reported 'out' value is the rounded SUM
        # of an additive bigint column instead of the row count — for marts
        # whose row count is constant under N copies (1x dims), the
        # additive aggregate is the exactly-Nx-checkable quantity
        from etl_ecommerce_data_spark.plans.queries import QUERIES

        def run(d, e, sdir):
            v = QUERIES[name].builder(spark, sdir).agg(F.sum(col)).first()[0]
            return int(v) if v is not None else 0  # empty result -> out=0,
            # so the out-ratio column flags it instead of int(None) crashing

        return run

    def stream_files(runner_name):
        # streaming runner driven into the production parquet file sink
        # (executor-side writes) instead of the driver-collected memory
        # verification sink; sink dirs live under SCRATCH so the final
        # rmtree cleans them
        import tempfile

        from etl_ecommerce_data_spark.streaming import events as EV

        fn = getattr(EV, runner_name)

        def run(d, e, sdir):
            out_dir = tempfile.mkdtemp(prefix="stream_sink_", dir=SCRATCH)
            return fn(spark, sdir, sink="files", out_dir=out_dir).count()

        return run

    def stream_files_sum(runner_name, col):
        # file-sink streaming runner reporting the SUM of an additive
        # column (for complete-mode aggs whose row count is constant under
        # N copies sharing one timeline)
        import tempfile

        from etl_ecommerce_data_spark.streaming import events as EV

        fn = getattr(EV, runner_name)

        def run(d, e, sdir):
            out_dir = tempfile.mkdtemp(prefix="stream_sink_", dir=SCRATCH)
            out = fn(spark, sdir, sink="files", out_dir=out_dir)
            v = out.agg(F.sum(col)).first()[0]
            return int(v) if v is not None else 0  # same empty-result guard

        return run

    ops = {
        "dedup_minhash_docs": lambda d, e, s: DD.minhash_lsh_pairs(d, threshold=0.6).count(),
        "dedup_simhash_docs": lambda d, e, s: DD.simhash_pairs(d, max_hamming=3).count(),
        "embedding_near_dup": lambda d, e, s: SIM.embedding_near_dup_pairs(
            e, threshold=0.4, exact=False, num_bits=48, bands=16
        ).count(),
        "dedup_cross_corpus": cross,
        "linkage_fuzzy_docs": linkage,
        "corpus_boilerplate": boilerplate,
        "curate_corpus_hygiene": hygiene,
        # retrieval pair (round 7): wall should scale ~linearly in corpus
        # size. inverted_index output rows scale ~Nx (prefixed copies make
        # the vocabulary disjoint); tfidf_search output is top-k on the
        # query terms, which only copy 0 contains — out ratio 1.0 BY
        # CONSTRUCTION there, the timing column is the evidence.
        "tfidf_search": registry("tfidf_search"),
        "inverted_index": registry("inverted_index"),
        # analytics marts (round 7): customer_metrics rows scale exactly
        # Nx (per-customer groups, disjoint key ranges); daily_sales keeps
        # its per-day row count with every additive aggregate at exactly Nx
        "customer_metrics": registry("customer_metrics"),
        "daily_sales": registry("daily_sales"),
        # streaming family (round 8, VERDICT r7 ask #4): the real
        # foreachBatch / stateful / watermark paths replayed over the Nx
        # events (disjoint user populations, identical timeline) and Nx
        # documents. Predictions: dedup keeps all rows (unique event_ids by
        # construction) -> Nx; upsert emits one row per user -> Nx; session
        # windows are per-user -> Nx; incremental dedup accepts one row per
        # unique text (copies are token-prefixed, so disjoint) -> Nx.
        # Streaming wall includes fixed query-startup/micro-batch overhead,
        # so expect SUB-linear ratios on these sizes.
        # dedup + session windows run the production-shaped parquet FILE
        # sink (sink="files"): the registry's memory sink is the oracle
        # verification harness and collects every emission onto the driver,
        # which caps how far it can scale (10M events OOM an 8g heap); the
        # file sink writes from the executors, so these two rows measure
        # the operator, not the harness. Both scales use the same sink.
        "stream_dedup_events": stream_files("run_dedup_events_to_memory"),
        "stream_upsert_user_latest": registry("stream_upsert_user_latest"),
        "stream_session_windows": stream_files("run_session_windows_to_memory"),
        "stream_incremental_dedup": registry("stream_incremental_dedup"),
        # remaining expensive-plan singles (VERDICT r7 residual #7):
        # profile_orders is a fixed 4-row profile (out ratio 1.0, timing is
        # the evidence); basket_pairs' per-pair n_orders scales exactly Nx,
        # so its n_orders>=2 cut admits every 1x co-occurring pair once
        # N>=2 — out ratio = pairs(>=1)/pairs(>=2) of the base corpus,
        # deterministic, not a red flag.
        "profile_orders": registry("profile_orders"),
        "basket_pairs": registry("basket_pairs"),
        # wide marts over 1x dims (round 9, VERDICT r8 #7): lineitem scales
        # Nx, part/supplier stay 1x (build_nx stages them unscaled), so
        # mart rows hold constant and the reported 'out' is the additive
        # item count — predicted exactly Nx (it equals matched lineitem
        # rows). product_performance probes the broadcast-dim join path,
        # supplier_performance the broadcast + fact-fact shuffle join.
        "product_performance": registry_sum("product_performance", "times_sold"),
        "supplier_performance": registry_sum("supplier_performance", "total_items"),
        # duplicate clustering (round 9, VERDICT r8 #7): label propagation
        # over the banded LSH pair graph. Copies are token-disjoint, so
        # clusters never span copies: node rows exactly Nx, iteration count
        # unchanged (component diameters are per-copy). Subject to the
        # quadratic-chance-pair subset rule like its minhash input.
        "dedup_clusters": registry("dedup_clusters"),
        # the CC stage alone on a copy-disjoint replicated edge graph —
        # the 100x-safe variant (see cc_graph's comment): node rows exactly
        # Nx, edge rows exactly Nx, iteration count copy-invariant.
        "dedup_clusters_cc": cc_graph,
        # update-mode + complete-mode streaming runners through the
        # production parquet file sink (round 9, VERDICT r8 ask #2):
        # user_stats emits one update row per user -> out exactly Nx;
        # windowed agg re-emits full state per batch (complete mode,
        # per-batch overwrite sink) over the copies' IDENTICAL timeline ->
        # window rows constant, reported 'out' is sum(n_events) -> exactly
        # Nx.
        "stream_user_stats_stateful": stream_files("run_user_running_stats_to_memory"),
        "stream_events_windowed": stream_files_sum(
            "run_windowed_stream_to_memory", "n_events"
        ),
        # the final two streaming runners (round 9): the stream-stream
        # interval join's matches stay within a copy (disjoint user
        # populations) -> out exactly Nx; static-enrich joins copy-i events
        # to copy-i customers (both stride), window x segment rows constant
        # over the shared timeline -> reported sum(n_events) exactly Nx.
        "stream_view_purchase_join": stream_files("run_view_purchase_join_to_memory"),
        "stream_static_enrich": stream_files_sum(
            "run_stream_static_enrich_to_memory", "n_events"
        ),
        # REFERENCE-PARITY medallion marts (round 9): the actual
        # pipeline.py gold functions (to_gold.py semantics, fan-out count
        # quirk and window-derived keys included) over the Olist-shaped
        # views. olist_daily_sales rows hold constant per day with the
        # additive fan-out count at exactly Nx; olist_customer_metrics is
        # per-customer (customer strides) -> rows exactly Nx, and its
        # min/max window functions run at Nx partition cardinality.
        "olist_daily_sales": registry_sum("olist_daily_sales", "total_orders"),
        "olist_customer_metrics": registry("olist_customer_metrics"),
        # sketch family (round 9): mergeable fixed-size state under Nx
        # input. CMS cell counts are additive over the SAME hash mapping,
        # so every estimate — and their reported sum — scales EXACTLY Nx
        # (collisions add the same relative mass). HLL distinct-users per
        # day is ~Nx (disjoint user populations per copy) within the
        # declared 2% rsd — out ratio ~N, not exactly N.00, BY DESIGN.
        # GK percentiles are copy-invariant (each copy replays the same
        # value distribution): out rows 1.00x, timing is the evidence.
        "event_counts_cms": registry_sum("event_counts_cms", "cms_estimate"),
        "daily_users_hll": registry_sum("daily_users_hll", "approx_users"),
        "value_percentiles_approx": registry("value_percentiles_approx"),
        # linkage skew dashboard (round 10, VERDICT r9 residual #7): block
        # keys are the docs' first two tokens, which the copy construction
        # prefixes — blocks are copy-disjoint and each copy reproduces the
        # base size distribution exactly, so the block-size-class rows hold
        # constant while the additive candidate-pair mass (the quantity the
        # per-block cap bounds) scales exactly Nx.
        "linkage_block_stats": registry_sum(
            "linkage_block_stats", "n_candidate_pairs"
        ),
    }
    if picked is not None:
        unknown = [n for n in picked if n not in ops]
        if unknown:
            raise SystemExit(f"unknown operators: {unknown}; have {list(ops)}")
        ops = {n: ops[n] for n in picked}
    # warm python workers / codegen
    for fn in ops.values():
        fn(d1, e1, sf_dir)
    nx = f"{n_copies}x"
    print(f"{'operator':<24} {'1x best(s)':>10} {nx + ' best(s)':>10} {'ratio':>6} {'out 1x':>9} {'out ' + nx:>9} {'out ratio':>9}")
    for name, fn in ops.items():
        t1, n1 = timed(lambda: fn(d1, e1, sf_dir))
        t3, n3 = timed(lambda: fn(d3, e3, tdir))
        print(
            f"{name:<24} {t1:>10.2f} {t3:>10.2f} {t3 / t1:>6.2f} {n1:>9} {n3:>9} {n3 / max(n1, 1):>9.2f}"
        )
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
