"""Time-window operators (SURVEY §7.1 M4 extension; no streams exist in the
reference — time-series behavior there is plain timestamp columns).

The same ``F.window``/``F.session_window`` expressions work in batch and in
Structured Streaming; batch mode is what the DuckDB oracle checks, streaming
mode is exercised via ``run_stream_availablenow`` (readStream → watermark →
windowed agg → memory sink).

Scale notes: tumbling/sliding windows are hash aggregates on (window, key) —
partial aggregation applies; session windows require a per-key sort (Spark
plans UpdatingSessionsExec); watermarks bound state size in streaming mode.
"""

from __future__ import annotations

import contextlib
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newyork_taxi_etl_spark.functions.exact import avg_exact
from newyork_taxi_etl_spark.localrel import local_rows_df


@contextlib.contextmanager
def _scoped_conf(spark, key: str, value: str):
    """Set a session conf for the duration of a streaming run, then restore.

    Streaming state-store partition count is pinned from
    ``spark.sql.shuffle.partitions`` at the FIRST micro-batch of a new
    checkpoint; for a bounded local drain every state partition costs a
    store init + commit per batch, so a small count is strictly faster here.
    On a real cluster size it to key cardinality instead — it cannot be
    changed after the checkpoint exists.
    """
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def _applied_batch_ids(state_dir: str) -> set:
    """Batch ids already folded into a foreachBatch state directory.

    foreachBatch's delivery contract is AT-LEAST-ONCE per micro-batch: if
    the driver dies after the fold but before the checkpoint commit, the
    SAME batch_id is redelivered on restart.  The applied-id set is the
    parquet analog of Delta's ``txnAppId``/``txnVersion`` dedup — it rides
    INSIDE the state directory as an underscore-prefixed sidecar (invisible
    to Spark's parquet reader, like ``_SUCCESS``), so for read-combine-swap
    state the fold and its watermark commit in ONE atomic os.rename.
    Batch ids from one checkpoint never repeat, so skip-on-replay makes the
    redelivered fold a no-op (one query per state dir — the app-id half of
    Delta's pair is implicit).
    """
    import os

    # Every fold reads this before touching state, so this is the one
    # choke-point where a crash between _swap_dir's two renames (live dir
    # missing, tombstone holding the only surviving generation) can be
    # healed before anything observes the hole (r8 ADVICE).
    _recover_dir(state_dir)
    marker = os.path.join(state_dir, "_applied_batches")
    if os.path.exists(marker):
        with open(marker) as f:
            return {int(x) for x in f.read().split()}
    return set()


def _mark_applied(state_dir: str, batch_id: int, prior: set) -> None:
    """Record ``batch_id`` as folded.  Call on the NOT-YET-RENAMED next
    directory for swap-style state (atomic with the data), or on the live
    directory for append-style state (non-atomic — documented at the call
    site; Delta's transaction log is the upgrade)."""
    import os

    with open(os.path.join(state_dir, "_applied_batches"), "w") as f:
        f.write("\n".join(str(i) for i in sorted(prior | {int(batch_id)})))


def _swap_dir(nxt: str, target_dir: str) -> None:
    """Commit ``nxt`` as the new ``target_dir`` state, crash-safely.

    A plain ``rmtree(target); rename(nxt, target)`` loses ALL state if the
    process dies between the two calls (r7 ADVICE).  Instead the old
    generation is renamed aside to a tombstone first — each step is a
    single atomic rename, so at every crash point a complete generation
    exists on disk: before step 1 the old target, between steps the
    tombstone + next, after step 2 the new target.  The tombstone rmtree
    at the end is pure garbage collection (Delta's transaction log +
    VACUUM is the production analog of this whole dance).
    """
    import os
    import shutil

    tomb = target_dir + "_tombstone"
    if os.path.exists(target_dir):
        shutil.rmtree(tomb, ignore_errors=True)  # GC a prior crashed sweep
        os.rename(target_dir, tomb)
    elif os.path.exists(tomb):
        # Crash landed between the two renames of a PRIOR sweep: the
        # tombstone is the only surviving generation.  It is about to be
        # superseded by ``nxt`` (which was folded on top of a recovered
        # read — see _recover_dir), so GC it rather than resurrect it
        # under the new generation.
        shutil.rmtree(tomb, ignore_errors=True)
    os.rename(nxt, target_dir)
    shutil.rmtree(tomb, ignore_errors=True)


def _recover_dir(target_dir: str) -> None:
    """Restore the tombstone as the live generation if a crash between
    ``_swap_dir``'s two renames left ``target_dir`` missing (r8 ADVICE:
    without this, the next fold silently restarts from EMPTY state — and
    an empty applied-batch sidecar — then garbage-collects the only
    surviving generation).  Call at the top of any fold that reads
    ``target_dir`` as prior state.  A single atomic rename; no-op when the
    live dir exists or there is nothing to restore."""
    import os

    tomb = target_dir + "_tombstone"
    if not os.path.exists(target_dir) and os.path.exists(tomb):
        os.rename(tomb, target_dir)


def _drain(q, timeout_sec: int) -> None:
    """Await an AvailableNow drain; fail loudly on timeout.

    ``awaitTermination(timeout)`` returns False (it does NOT raise) if the
    query is still running — reading the sink at that point would silently
    return partial results.
    """
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"streaming drain did not finish within {timeout_sec}s"
        )


#: per-process stage-cache namespace token (see _stage_cache_dir)
_PROC_STAGE_TOKEN: str | None = None

#: guards the lazy token mint (r15 ADVICE: an unlocked check-then-set could
#: mint two tokens under concurrent first calls — the loser's stages would
#: silently rebuild under an orphaned root for the rest of the process)
import threading as _threading  # noqa: E402

_PROC_STAGE_LOCK = _threading.Lock()

#: append-only (cache_key, "hit"|"miss") event log (r15 verdict item 9:
#: bench_detail.json records per-query stage-cache activity so warm-artifact
#: per-query numbers are auditable; pure logging, no behavior change)
_STAGE_CACHE_EVENTS: list[tuple[str, str]] = []


def _stage_cache_dir(cache_key: str) -> str:
    """Deterministic per-key directory under a PER-PROCESS temp root for
    REUSABLE read-only stream stages and trained artifacts.  The staged
    input of a bounded drain is pure harness scaffolding — same source
    rows, same derived sentinels, same FIXED mtimes every time — so
    rebuilding it per invocation (bench runs each query best-of-3) only
    re-pays the range-shuffle write without changing a single value.
    Only read-only inputs/artifacts are ever shared; checkpoints, sinks,
    and state directories stay strictly per-run.

    Scoped to the current PROCESS (r15): a root shared across processes
    would let one run serve another run's persisted intermediates keyed
    on the data directory — precisely the cross-run result-caching the
    optimization-round contract forbids.  Every bench/verify process
    builds its stages from the parquet inputs once and shares them only
    among its own consumers and bench reps; the root is removed at
    process exit (a crashed process leaks one uuid-named dir in the
    system temp dir, never served to any later process)."""
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    global _PROC_STAGE_TOKEN
    base = os.path.join(tempfile.gettempdir(), "nyetl_stage_cache")
    with _PROC_STAGE_LOCK:
        if _PROC_STAGE_TOKEN is None:
            _PROC_STAGE_TOKEN = f"pid{os.getpid()}-{uuid.uuid4().hex[:8]}"
            root = os.path.join(base, _PROC_STAGE_TOKEN)
            os.makedirs(root, exist_ok=True)
            atexit.register(shutil.rmtree, root, ignore_errors=True)
    return os.path.join(
        base,
        _PROC_STAGE_TOKEN,
        hashlib.md5(cache_key.encode()).hexdigest()[:20],
    )


def _fs_fingerprint(path: str) -> str:
    """Cheap content fingerprint of a source-data path: md5 over the
    sorted (relpath, size, mtime_ns) inventory of its files (or the
    single file's stat).  Pure filesystem metadata — no data read, no
    Spark job — yet it changes whenever the corpus under ``path`` is
    regenerated (new generator seed, data fix), which is exactly the
    event that must invalidate cached TRAINED artifacts (r14 ADVICE:
    a stale centroid/codebook/weights stage served against regenerated
    parquet would diverge from the DuckDB oracle, which always retrains
    on the live data)."""
    import hashlib
    import os

    h = hashlib.md5()
    try:
        if os.path.isfile(path):
            st = os.stat(path)
            h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
        else:
            for root, dirs, files in os.walk(path):
                dirs.sort()
                for fn in sorted(files):
                    fp = os.path.join(root, fn)
                    try:
                        st = os.stat(fp)
                    except OSError:
                        continue
                    rel = os.path.relpath(fp, path)
                    h.update(
                        f"{rel}:{st.st_size}:{st.st_mtime_ns};".encode()
                    )
    except OSError:
        return "nofs"
    return h.hexdigest()[:12]


def _fingerprinted_key(cache_key: str) -> str:
    """Fold the corpus fingerprint into a stage-cache key.  Every key in
    the tree is colon-joined with the source sf_dir embedded as one
    segment (``"ivfcent8:/root/testdata/sf0.01"``,
    ``"documents_qg:{sf_dir}:quality_stage3"`` ...); each segment that
    names an existing path contributes its :func:`_fs_fingerprint`, so
    regenerating the parquet under an sf_dir lands in a DIFFERENT cache
    directory and the stale generation is simply never hit again
    (assumption, documented: source dirs contain no ``:``)."""
    import os

    fps = [
        _fs_fingerprint(seg)
        for seg in cache_key.split(":")
        if seg.startswith("/") and os.path.exists(seg)
    ]
    return cache_key + "".join("@" + f for f in fps)


def _stage_cached(stage_dir: str, cache_key: str | None, build) -> str:
    """Build-once wrapper around a staging builder: on a cache hit return
    the completed cached stage without running any Spark job; on a miss
    ``build`` into a temp dir and commit it with an atomic rename (the
    _swap_dir discipline — a crashed half-build is invisible because the
    _STAGE_COMPLETE marker only exists inside fully-built generations).
    With no ``cache_key`` the stage builds uncached into ``stage_dir``
    (the original behavior).  Keys are corpus-fingerprinted (see
    :func:`_fingerprinted_key`) so cached trained artifacts can never
    outlive the data they were trained on."""
    import os
    import shutil
    import uuid as _uuid

    if cache_key is None:
        shutil.rmtree(stage_dir, ignore_errors=True)
        build(stage_dir)
        return stage_dir
    raw_key = cache_key
    cache_key = _fingerprinted_key(cache_key)
    cdir = _stage_cache_dir(cache_key)
    if os.path.exists(os.path.join(cdir, "_STAGE_COMPLETE")):
        _STAGE_CACHE_EVENTS.append((raw_key, "hit"))
        return cdir
    _STAGE_CACHE_EVENTS.append((raw_key, "miss"))
    tmp = cdir + ".build-" + _uuid.uuid4().hex[:8]
    build(tmp)
    with open(os.path.join(tmp, "_STAGE_COMPLETE"), "w") as f:
        f.write(cache_key)
    os.makedirs(os.path.dirname(cdir), exist_ok=True)
    try:
        os.rename(tmp, cdir)
    except OSError:
        # lost a (test-parallelism) race: the winner's stage is complete
        shutil.rmtree(tmp, ignore_errors=True)
    return cdir


def df_stage_cached(spark, cache_key: str, build_df, n_files: int | None = None):
    """Parquet-backed per-process stage cache for a DETERMINISTIC
    DataFrame shared by several registered queries (r16, guide §2.4/§1.2 —
    the _tops_cached / _ivf_centroids_cached discipline generalized): the
    first consumer in the process builds the stage from the parquet inputs
    and every later consumer (including later bench reps) reads it back.

    Value identity: every column type the engine passes here (bigint,
    double, string, boolean) round-trips parquet bit-exactly, and all
    downstream consumers are row-order/partitioning independent.  Keys are
    corpus-fingerprinted (see :func:`_fingerprinted_key`) and the root is
    per-process with removal at exit — no cross-run reuse.

    ``n_files``: coalesce tiny bounded tables to few output files (skip it
    for corpus-sized stages — their natural partitioning is the scalable
    layout)."""
    import os

    def build(target: str) -> None:
        os.makedirs(target, exist_ok=True)
        df = build_df()
        if n_files is not None:
            df = df.coalesce(n_files)
        df.write.mode("overwrite").parquet(os.path.join(target, "t"))

    sdir = _stage_cached(None, cache_key, build)
    return spark.read.parquet(os.path.join(sdir, "t"))


def _stage_time_sliced(
    spark,
    src_df,
    stage_dir,
    sentinel_rows=None,
    n_slices=3,
    sentinel_fn=None,
    cache_key=None,
):
    """Stage ``src_df`` as time-CONTIGUOUS parquet slices with strictly
    increasing mtimes, plus a trailing sentinel file stamped last; returns
    the directory the stream should read (== ``stage_dir`` uncached, the
    shared cache generation when ``cache_key`` is set — see
    :func:`_stage_cached`).

    ``repartitionByRange(n, ts)`` cuts the timeline into contiguous ranges
    in ONE distributed range-shuffle job (partition i = i-th range, written
    as ``part-0000i``) — replacing the earlier staging ntile, whose global
    sort ran single-partition three times.  The parquet file source orders
    same-mtime files arbitrarily, so each slice is stamped with an
    increasing mtime; that ordering is the only thing these bounded drains
    lean on (a production stream arrives time-ordered by nature).  The
    sentinel file must sort LAST: read first it would fast-forward the
    watermark and late-drop every real row.  ``sentinel_fn`` defers the
    sentinel derivation (usually a max-ts scan) to cache misses only.
    """
    import os

    def build(target: str) -> None:
        (
            src_df.repartitionByRange(n_slices, "ts")
            .write.mode("overwrite")
            .parquet(target)
        )
        files = sorted(
            f for f in os.listdir(target) if f.endswith(".parquet")
        )
        for i, f in enumerate(files):
            t = 1_600_000_000 + (i + 1) * 10
            os.utime(os.path.join(target, f), (t, t))
        before = set(os.listdir(target))
        rows = sentinel_rows if sentinel_rows is not None else sentinel_fn()
        sent = local_rows_df(spark, rows, src_df.schema)
        sent.coalesce(1).write.mode("append").parquet(target)
        t = 1_600_000_000 + (len(files) + 1) * 10
        for f in os.listdir(target):
            if f not in before and f.endswith(".parquet"):
                os.utime(os.path.join(target, f), (t, t))

    return _stage_cached(stage_dir, cache_key, build)


def tumbling_agg(
    df: DataFrame, ts: str = "ts", dur: str = "1 hour", value: str = "value"
) -> DataFrame:
    """Tumbling-window count/avg."""
    return (
        df.groupBy(F.window(ts, dur).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            avg_exact(value).alias("avg_value"),
        )
        .select(F.col("w.start").alias("w_start"), "cnt", "avg_value")
        .orderBy("w_start")
    )


def sliding_agg(
    df: DataFrame,
    ts: str = "ts",
    dur: str = "1 hour",
    slide: str = "30 minutes",
    value: str = "value",
) -> DataFrame:
    """Sliding-window count/avg (each row lands in dur/slide windows)."""
    return (
        df.groupBy(F.window(ts, dur, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            avg_exact(value).alias("avg_value"),
        )
        .select(F.col("w.start").alias("w_start"), "cnt", "avg_value")
        .orderBy("w_start")
    )


def session_agg(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Session windows per key (gap-based)."""
    return (
        df.groupBy(F.col(key), F.session_window(ts, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(key, F.col("w.start").alias("session_start"), "n_events")
        .orderBy(key, "session_start")
    )


def run_stream_availablenow(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    ts: str = "ts",
    dur: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Real Structured Streaming pass over a bounded source:
    stage the batch input to parquet, readStream it → withWatermark →
    tumbling count → memory sink, Trigger.AvailableNow (drain all input,
    then stop).

    Staging exists because the driver's raw events file stores nanosecond
    timestamps Spark can't stream-read directly (see sources.readers.
    read_events); the staged copy has the repaired schema.
    """
    src_df.write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .load()
    )
    agg = (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(ts, dur).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("w_start"), "cnt")
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, 120)
    return spark.table(name).orderBy("w_start")


def run_streaming_dedup(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    keys: list[str] | None = None,
    ts: str = "ts",
    watermark: str = "1440 hours",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``withWatermark → dropDuplicatesWithinWatermark(keys)``.

    The input is deliberately DOUBLED (`union all` with itself) before
    staging, so every key arrives twice and the dedup operator provably does
    work; the returned single-row count must equal the batch
    ``COUNT(DISTINCT keys)`` of the original source — which is what the
    DuckDB oracle checks.

    Scale shape: state is one entry per key within the watermark horizon —
    the watermark is what makes exact dedup feasible on an unbounded stream
    (state is evicted once ``watermark > event_time + delay``). Here the
    delay (60 days) exceeds the 30-day corpus span, so nothing evicts and
    the count is deterministic; on a real pipeline the delay is the
    duplicate-arrival SLA, not the corpus span.
    """
    keys = keys or ["user_id", ts]
    doubled = src_df.unionAll(src_df)
    doubled.write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .load()
    )
    deduped = stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)
    name = f"dedup_out_{uuid.uuid4().hex[:8]}"
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, 120)
    return spark.table(name).agg(F.count(F.lit(1)).alias("n"))


def run_stateful_user_stats(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    key: str = "user_id",
    value: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-key running (count, max) maintained in explicit GroupState across
    micro-batches, emitted in update mode.

    The state schema is a fixed-width (count, max) tuple, so state size is
    O(distinct keys) regardless of input volume — the watermark-free shape
    is safe here because the key domain is bounded. The driver drains the
    bounded source with Trigger.AvailableNow; because update mode re-emits a
    key's row each batch it appears in, the memory-sink output is folded
    with a max() per key (counts/maxes are monotone), making the final
    result equal to the batch ``groupBy(key).agg(count, max)`` — which is
    exactly what the DuckDB oracle checks.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    src_df.write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .load()
    )

    def update_fn(key_tuple, pdf_iter, state):
        n, mx = state.get if state.exists else (0, None)
        for pdf in pdf_iter:
            n += len(pdf)
            if len(pdf):
                m = float(pdf[value].max())
                mx = m if mx is None else max(mx, m)
        state.update((n, mx))
        yield pd.DataFrame(
            {key: [key_tuple[0]], "n_events": [n], "max_value": [mx]}
        )

    stats = stream.groupBy(key).applyInPandasWithState(
        update_fn,
        outputStructType=f"{key} bigint, n_events bigint, max_value double",
        stateStructType="n bigint, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stateful_out_{uuid.uuid4().hex[:8]}"
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
        q = (
            stats.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, 120)
    return (
        spark.table(name)
        .groupBy(key)
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_value").alias("max_value"),
        )
    )


def run_stream_stream_join(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    watermark: str = "1440 hours",
) -> DataFrame:
    """Real stream-stream inner join: purchases x clicks on user_id with an
    event-time range (click within the 30 minutes before the purchase).

    Both sides carry watermarks and the join condition carries the time
    range — the two ingredients Structured Streaming needs to bound join
    state: a side's row is held only until the watermark passes the last
    instant it could still match. Here the watermark delay (60 days)
    exceeds the bounded corpus span so nothing is dropped mid-drain and the
    joined pair set provably equals the batch time-range join, which the
    DuckDB oracle value-checks; on a real pipeline the delay is the
    out-of-order SLA and state stays O(rows inside the horizon).
    """
    src_df.write.mode("overwrite").parquet(stage_dir)

    def _stream():
        return (
            spark.readStream.schema(src_df.schema)
            .format("parquet")
            .option("path", stage_dir)
            .load()
        )

    purchases = (
        _stream()
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    clicks = (
        _stream()
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND "
            "c_ts >= p_ts - INTERVAL 30 MINUTES AND c_ts <= p_ts"
        ),
    )
    name = f"ssjoin_out_{uuid.uuid4().hex[:8]}"
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, 120)
    return (
        spark.table(name)
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


def run_foreachbatch_upsert(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    target_dir: str,
    cache_key: str | None = None,
) -> DataFrame:
    """Incremental materialized view via ``foreachBatch``: per micro-batch,
    aggregate the batch and MERGE the partial aggregates into a target
    table (read-combine-swap on plain parquet; with Delta installed the
    body becomes a single ``MERGE INTO``).

    The stage is written as several files and streamed with
    ``maxFilesPerTrigger=1`` so the drain REALLY iterates (multiple
    micro-batches, each folding into the target) — the final target must
    equal the one-shot batch aggregate, which the DuckDB oracle
    value-checks. Partial counts/sums combine associatively (sums carried
    as DECIMAL until the final cast), so batch boundaries cannot skew the
    result — the same mergeability argument that makes map-side partial
    aggregation correct.
    """
    import os
    import shutil

    # read-only stage shared build-once via the r12 _stage_cached
    # discipline (harness scaffolding only — checkpoints, sinks and the
    # applied-batch sidecar stay strictly per-run)
    stage_dir = _stage_cached(
        stage_dir,
        cache_key,
        lambda target: src_df.repartition(4)
        .write.mode("overwrite")
        .parquet(target),
    )
    shutil.rmtree(target_dir, ignore_errors=True)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    upsert = _upsert_counts_fn(target_dir)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
        q = (
            stream.writeStream.foreachBatch(upsert)
            .option(
                "checkpointLocation",
                stage_dir + f"_ckpt_{uuid.uuid4().hex[:8]}",
            )
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, 180)
    return (
        spark.read.parquet(target_dir)
        .select(
            "user_id",
            "n_events",
            F.col("sum_value").cast("double").alias("total_value"),
        )
        .orderBy("user_id")
    )


def run_upsert_replay_proof(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    target_dir: str,
    cache_key: str | None = None,
) -> DataFrame:
    """Idempotent-retry PROOF for the foreachBatch fold family: drain the
    incremental upsert exactly like ``run_foreachbatch_upsert``, then call
    the fold body AGAIN with an already-committed batch_id — simulating the
    at-least-once redelivery foreachBatch's contract allows after a crash
    between fold and checkpoint commit.  The replayed call must be a no-op
    (the applied-batch sidecar, ``_applied_batch_ids``): the returned state
    still equals the one-shot batch aggregate the oracle computes.  Without
    the guard every replayed row double-folds and the value compare fails.

    The replay payload is deliberately the WHOLE stage (a superset of the
    real batch): dedup keys on batch_id alone, exactly like Delta's
    txnAppId/txnVersion, never on payload equality.
    """
    import os
    import shutil

    # same read-only stage (and cache key) as run_foreachbatch_upsert —
    # both drain src_df.repartition(4); per-run state stays private
    stage_dir = _stage_cached(
        stage_dir,
        cache_key,
        lambda target: src_df.repartition(4)
        .write.mode("overwrite")
        .parquet(target),
    )
    shutil.rmtree(target_dir, ignore_errors=True)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )
    upsert = _upsert_counts_fn(target_dir)
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
        q = (
            stream.writeStream.foreachBatch(upsert)
            .option(
                "checkpointLocation",
                stage_dir + f"_ckpt_{uuid.uuid4().hex[:8]}",
            )
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, 180)

    applied = _applied_batch_ids(target_dir)
    if not applied:
        raise RuntimeError("drain committed no batches — nothing to replay")
    # the redelivery: same batch_id, superset payload -> must be a no-op
    upsert(spark.read.parquet(stage_dir), max(applied))
    if _applied_batch_ids(target_dir) != applied:
        raise RuntimeError("replayed batch mutated the applied-batch log")
    return (
        spark.read.parquet(target_dir)
        .select(
            "user_id",
            "n_events",
            F.col("sum_value").cast("double").alias("total_value"),
        )
        .orderBy("user_id")
    )


def run_streaming_cms(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    col: str = "user_id",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Streaming count-min sketch: the drained counter matrix must be
    BIT-IDENTICAL to the batch sketch over the same rows.

    CMS is a linear sketch — counters are sums — so partial sketches from
    any micro-batching merge by elementwise add, which is exactly what a
    complete-mode streaming aggregation on (j, bucket) maintains.
    ``maxFilesPerTrigger=1`` over a multi-file stage forces a REAL
    multi-batch drain (the merge path actually runs); the oracle then
    value-checks the result against the one-shot batch CMS. This is the
    100 TB streaming-profile shape: state is depth*width counters however
    large the stream, and the same counters are mergeable across restarts,
    replicas, or a batch backfill.
    """
    from newyork_taxi_etl_spark.operators.sketch import cms_counters

    src_df.repartition(4).write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", "1")
        .load()
    )
    counters = cms_counters(stream, col, depth, width)
    name = f"cms_out_{uuid.uuid4().hex[:8]}"
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
        q = (
            counters.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, 120)
    return spark.table(name).orderBy("j", "bucket")


def run_stream_static_enrich(
    spark,
    src_df: DataFrame,
    dim_df: DataFrame,
    stage_dir: str,
    timeout_sec: int = 120,
) -> DataFrame:
    """Stream-static broadcast enrich: the most common production
    streaming shape (facts stream in, a small dimension table sits
    static) — the stream side never shuffles for the join; each
    micro-batch hash-joins against the broadcast dimension exactly like
    the batch `broadcast_enrich`, then feeds a keyed aggregate in
    complete mode. The static side is planned ONCE; state is bounded by
    the dimension-key cardinality.
    """
    import uuid as _uuid

    src_df.write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .load()
    )
    enriched = stream.withColumn(
        "nk", F.pmod(F.col("user_id"), F.lit(25))
    ).join(F.broadcast(dim_df), F.col("nk") == F.col("n_nationkey"))
    agg = enriched.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(38,12)"))
        .cast("double")
        .alias("sum_value"),
    )
    name = f"stream_enrich_{_uuid.uuid4().hex[:8]}"
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)
    return (
        spark.table(name)
        .select(
            "n_name", "cnt", F.round(F.col("sum_value"), 4).alias("sum_value")
        )
        .orderBy("n_name")
    )


def run_streaming_decayed_scores(
    spark,
    src_df: DataFrame,
    ref_df: DataFrame,
    stage_dir: str,
    lam: float = 0.01,
    timeout_sec: int = 120,
) -> DataFrame:
    """Streaming exponential-decay scores, bit-identical to the batch twin.

    Decay against a MOVING reference can't accumulate incrementally
    without rescaling, but against a FIXED reference timestamp the decayed
    score is a plain weighted sum — LINEAR, like the streaming CMS: each
    event's weight exp(-lam * age_hours) is computed in the micro-batch
    (microsecond-exact age vs the broadcast 1-row reference, exp ROUNDed
    at 12), and a complete-mode decimal aggregate merges partial sums in
    any batching order. ``ref_df`` is the batch-computed corpus max
    timestamp here (the stream-static pattern — in production it is the
    rollover boundary of the decay window; rescaling to a new reference
    multiplies every score by one constant). ``maxFilesPerTrigger=1`` over
    a 4-file stage forces a real multi-batch drain.
    """
    import uuid as _uuid

    src_df.repartition(4).write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", "1")
        .load()
    )
    ref = ref_df.withColumn("one", F.lit(1))
    age_h = (F.unix_micros("mx_ts") - F.unix_micros("ts")) / F.lit(
        3600000000.0
    )
    weighted = (
        stream.withColumn("one", F.lit(1))
        .join(F.broadcast(ref), "one")
        .select(
            "event_type",
            F.round(F.exp(-lam * age_h), 12).alias("wgt"),
        )
    )
    agg = weighted.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("wgt").cast("decimal(38,12)"))
        .cast("double")
        .alias("decayed_score"),
    )
    name = f"decay_out_{_uuid.uuid4().hex[:8]}"
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)
    return (
        spark.table(name)
        .select(
            "event_type",
            "n_events",
            F.round(F.col("decayed_score"), 6).alias("decayed_score"),
        )
        .orderBy("event_type")
    )


def run_streaming_decay_rescale(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    target_dir: str,
    lam: float = 0.01,
    timeout_sec: int = 180,
) -> DataFrame:
    """Exp-decay scores against a MOVING reference: ``foreachBatch`` state
    rescale (the production pattern ``run_streaming_decayed_scores``
    deliberately simplified away by fixing the reference).

    Per micro-batch, the state table ``(event_type, n_events, score,
    ref_micros)`` is folded forward: the new reference is
    ``max(previous reference, batch max ts)``; every ACCUMULATED score is
    multiplied by the ONE constant ``exp(-lam * Δref_hours)`` (decay is an
    exponential — moving the reference rescales all weights uniformly,
    state stays O(event types), no event is ever revisited); batch events
    are weighted directly against the new reference and summed in. After
    the drain the reference has risen to the corpus max timestamp, so the
    final state equals the batch twin computed at that reference.

    Numerics: weights stay UNROUNDED doubles. A rescale chain
    ``exp(-λa)·exp(-λb)·…`` differs from the one-shot ``exp(-λ(a+b+…))``
    only in float ulps (~1e-16 relative per factor, ≤ #batches factors),
    so the drained sums sit within ~1e-9 of the one-shot batch sums —
    the registered query rounds at 3 decimals, 5+ orders of magnitude of
    margin, and ``tests/test_decay_rescale.py`` pins the raw gap at 1e-6.
    All per-batch work is dataflow (1-row broadcast reference joins, the
    same shape as the fixed-reference variant); the state swap is
    read-combine-swap on parquet exactly like ``run_foreachbatch_upsert``
    (with Delta installed the body becomes one ``MERGE INTO``).
    """
    import os
    import shutil

    src_df.repartition(4).write.mode("overwrite").parquet(stage_dir)
    shutil.rmtree(target_dir, ignore_errors=True)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )
    us_h = 3600000000.0  # microseconds per hour

    def rescale_merge(batch_df, batch_id):
        applied = _applied_batch_ids(target_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: rescale+fold already committed
        ss = batch_df.sparkSession
        bmax = batch_df.agg(F.unix_micros(F.max("ts")).alias("b_ref"))
        have_state = os.path.exists(target_dir)
        if have_state:
            prev = ss.read.parquet(target_dir)
            pref = prev.agg(F.max("ref_micros").alias("p_ref"))
            # 1 row: the reference only ever moves forward (an all-late
            # batch keeps the previous reference; its events still get
            # weights < 1 against it)
            refs = bmax.crossJoin(pref).select(
                F.greatest(
                    F.coalesce("b_ref", F.col("p_ref")), F.col("p_ref")
                ).alias("new_ref"),
                "p_ref",
            )
        else:
            prev = None
            refs = bmax.select(
                F.col("b_ref").alias("new_ref"),
                F.lit(None).cast("long").alias("p_ref"),
            )
        agg = (
            batch_df.crossJoin(F.broadcast(refs.select("new_ref")))
            .select(
                "event_type",
                F.exp(
                    F.lit(-lam)
                    * (F.col("new_ref") - F.unix_micros("ts"))
                    / F.lit(us_h)
                ).alias("wgt"),
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("b_n"),
                F.sum("wgt").alias("b_score"),
            )
        )
        if have_state:
            rescale = F.exp(
                F.lit(-lam) * (F.col("new_ref") - F.col("p_ref")) / F.lit(us_h)
            )
            merged = (
                prev.select(
                    F.col("event_type").alias("k_prev"),
                    F.col("n_events").alias("n0"),
                    F.col("score").alias("s0"),
                )
                # eqNullSafe merge key (same contract as _upsert_counts_fn):
                # a NULL event_type group folds instead of duplicating
                .join(
                    agg.withColumnRenamed("event_type", "k_new"),
                    F.col("k_prev").eqNullSafe(F.col("k_new")),
                    "full_outer",
                )
                .crossJoin(F.broadcast(refs))
                .select(
                    F.coalesce("k_prev", "k_new").alias("event_type"),
                    (
                        F.coalesce("n0", F.lit(0)) + F.coalesce("b_n", F.lit(0))
                    ).cast("bigint").alias("n_events"),
                    (
                        F.coalesce(F.col("s0") * rescale, F.lit(0.0))
                        + F.coalesce("b_score", F.lit(0.0))
                    ).alias("score"),
                    F.col("new_ref").alias("ref_micros"),
                )
            )
        else:
            merged = agg.crossJoin(F.broadcast(refs)).select(
                "event_type",
                F.col("b_n").alias("n_events"),
                F.col("b_score").alias("score"),
                F.col("new_ref").alias("ref_micros"),
            )
        nxt = target_dir + "_next"
        merged.write.mode("overwrite").parquet(nxt)
        _mark_applied(nxt, batch_id, applied)  # commits atomically with swap
        _swap_dir(nxt, target_dir)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
        q = (
            stream.writeStream.foreachBatch(rescale_merge)
            .option(
                "checkpointLocation",
                stage_dir + f"_ckpt_{uuid.uuid4().hex[:8]}",
            )
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)
    return (
        spark.read.parquet(target_dir)
        .select(
            "event_type",
            "n_events",
            F.round(F.col("score"), 3).alias("decayed_score"),
        )
        .orderBy("event_type")
    )


def run_streaming_lsh_index(
    spark,
    docs_df: DataFrame,
    stage_dir: str,
    index_dir: str,
    pairs_dir: str,
    k: int = 4,
    rows_per_band: int = 2,
    max_band_size: int = 64,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """Incremental MinHash-LSH dedup index via ``foreachBatch`` — dedup a
    document STREAM against everything already ingested.

    Per micro-batch: MinHash the batch's documents, explode their band
    keys (`operators.dedup.lsh_band_rows` — the exact construction the
    batch pair join uses), probe the accumulated band index for
    collisions (cross-batch candidate pairs), self-join within the batch
    (same-batch pairs), append the pairs found and then the batch's bands
    to the index. Because every collision is discovered when its LATER
    member arrives — whatever the arrival order — the drained pair set
    equals the one-shot batch LSH join over the full corpus, which is
    what the oracle twin checks.

    Scale shape: the index is an append-only table keyed by
    (band_idx, band_hash) — at corpus scale a parquet/Delta table
    partitioned by band bucket, so each micro-batch's probe is a plain
    hash join touching only its buckets, and state never lives in
    memory. The hot-band cap drops buckets over ``max_band_size``
    members (batch side and index side) before joining; incrementally
    the cap is PREFIX-capped — a bucket emits pairs until it crosses the
    cap, then goes dark — which only diverges from the batch twin's
    global cap on buckets that cross it mid-stream (none at these SFs;
    boilerplate buckets that large belong to the exact-dedup pass
    anyway, as the batch op documents).
    """
    import os
    import shutil

    from newyork_taxi_etl_spark.operators.dedup import (
        lsh_band_rows,
        with_minhash,
    )

    # staged source is deterministic scaffolding (same rows, same 4 range
    # slices every invocation) — share it per process like the other
    # drains' staged inputs (r16); index/pairs/checkpoint stay per-run
    def _build_stage(target: str) -> None:
        docs_df.repartitionByRange(4, "doc_id").write.mode(
            "overwrite"
        ).parquet(target)

    stage_dir = _stage_cached(stage_dir, cache_key, _build_stage)
    shutil.rmtree(index_dir, ignore_errors=True)
    shutil.rmtree(pairs_dir, ignore_errors=True)
    stream = (
        spark.readStream.schema(docs_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def fold(batch_df, batch_id):
        applied = _applied_batch_ids(index_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: bands+pairs already appended
        ss = batch_df.sparkSession
        bands = lsh_band_rows(
            with_minhash(batch_df, k=k), "doc_id", k, rows_per_band
        ).localCheckpoint(eager=True)
        hot = (
            bands.groupBy("band_idx", "band_hash")
            .agg(F.count(F.lit(1)).alias("_m"))
            .filter(F.col("_m") > max_band_size)
            .select("band_idx", "band_hash")
        )
        bands = bands.join(
            F.broadcast(hot), ["band_idx", "band_hash"], "left_anti"
        )
        a, b = bands.alias("a"), bands.alias("b")
        within = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
            )
        )
        if os.path.exists(index_dir):
            idx = ss.read.parquet(index_dir)
            idx_hot = (
                idx.groupBy("band_idx", "band_hash")
                .agg(F.count(F.lit(1)).alias("_m"))
                .filter(F.col("_m") > max_band_size)
                .select("band_idx", "band_hash")
            )
            idx = idx.join(
                F.broadcast(idx_hot), ["band_idx", "band_hash"], "left_anti"
            )
            cross = (
                bands.withColumnRenamed("doc_id", "new_id")
                .join(idx, ["band_idx", "band_hash"])
                .select(
                    F.least("doc_id", "new_id").alias("id_a"),
                    F.greatest("doc_id", "new_id").alias("id_b"),
                )
            )
            pairs = within.unionAll(cross)
        else:
            pairs = within
        pairs.distinct().write.mode("append").parquet(pairs_dir)
        bands.write.mode("append").parquet(index_dir)
        # append-style state: the marker is written AFTER both appends, so a
        # crash between append and mark redelivers and re-appends (duplicate
        # band rows inflate hot-band counts).  Delta's txn log closes that
        # window; on plain parquet this narrows it to the mark write.
        _mark_applied(index_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
        q = (
            stream.writeStream.foreachBatch(fold)
            .option(
                "checkpointLocation",
                stage_dir + f"_ckpt_{uuid.uuid4().hex[:8]}",
            )
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)
    return (
        spark.read.schema("id_a long, id_b long")
        .parquet(pairs_dir)
        .distinct()
        .orderBy("id_a", "id_b")
    )


def run_stream_stream_outer_join(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    watermark: str = "1 hour",
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join — the null-emission
    semantics the inner variant (:func:`run_stream_stream_join`) never
    exercises.

    An outer result for an unmatched purchase can only be emitted once
    the engine PROVES no matching click can still arrive — i.e. when the
    global watermark passes the end of that purchase's match window. Two
    consequences shape this runner:

    * the watermark delay must be SMALL relative to the corpus span
      (1 hour here, vs the inner variant's span-exceeding 60 days) or no
      unmatched row would ever flush during a bounded drain;
    * the drain needs a final event beyond every real match window to
      push the watermark past all held state: a SENTINEL purchase+click
      pair (user_id = −1) at corpus-max + 100 hours, staged in a file
      written AFTER the data files so the file source reads it last —
      a sentinel read first would fast-forward the watermark and drop
      every real row as late. The sentinel matches only itself and is
      filtered from the drained output.

    The drained (purchase, click-or-null) set then equals the batch LEFT
    JOIN with the same time-range condition, which the oracle
    value-checks per user (matched pair count + unmatched count).
    Production mapping: the sentinel's job is done by ordinary data flow
    (the watermark advances as events keep arriving); state per side
    stays O(rows inside watermark + range horizon).
    """
    from datetime import timedelta

    # The stage MUST arrive time-ordered: with a 1-hour watermark, a
    # hash-split stage would put the whole span in every file and batch 1
    # would fast-forward the watermark past the later batches, dropping
    # them as late — see _stage_time_sliced. The 1h delay also exceeds the
    # 30-min join range, so no cross-slice match is ever evicted early.
    def _sentinels():
        mx = src_df.agg(F.max("ts").alias("m")).collect()[0]["m"]
        s_ts = mx + timedelta(hours=100)
        return [(-1, s_ts, -1, "purchase", 0.0, None),
                (-2, s_ts, -1, "click", 0.0, None)]

    stage_dir = _stage_time_sliced(
        spark,
        src_df,
        stage_dir,
        sentinel_fn=_sentinels,
        cache_key=cache_key,
    )
    def _stream():
        return (
            spark.readStream.schema(src_df.schema)
            .format("parquet")
            .option("path", stage_dir)
            .option("maxFilesPerTrigger", 1)
            .load()
        )

    purchases = (
        _stream()
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    clicks = (
        _stream()
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND "
            "c_ts >= p_ts - INTERVAL 30 MINUTES AND c_ts <= p_ts"
        ),
        "leftOuter",
    )
    name = f"ssouter_out_{uuid.uuid4().hex[:8]}"
    # 4 state partitions: stream-stream join state is tiny here and each
    # micro-batch pays per-partition state-store open/commit — fewer, fuller
    # stores beat 8 near-empty ones (same knob a real job sizes to load)
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)
    return (
        spark.table(name)
        .filter(F.col("p_user") >= 0)
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.count("click_id").cast("bigint").alias("n_pairs"),
            F.count(F.when(F.col("click_id").isNull(), 1))
            .cast("bigint")
            .alias("n_unmatched"),
        )
        .orderBy("user_id")
    )


def run_stream_stream_two_sided_outer(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    join_type: str,
    watermark: str = "1 hour",
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """Watermarked stream-stream FULL OUTER / RIGHT OUTER join — completes
    the outer-join matrix beside :func:`run_stream_stream_outer_join`'s
    LEFT OUTER (r6 verdict optional (a); that verified runner is left
    untouched — this one parametrizes the join type and reports BOTH
    unmatched directions).

    Same mechanics as the left-outer runner: time-ordered mtime-stamped
    3-slice stage; both sides watermarked small (1h) so unmatched state
    really expires mid-drain; a trailing sentinel purchase+click pair at
    corpus-max + 100h pushes the global watermark past every real match
    window, flushing held null-extended rows on BOTH sides before the
    AvailableNow drain ends.  fullOuter additionally emits unmatched
    CLICKS (purchase-side nulls) — the state the left join silently
    discards; rightOuter preserves clicks only.  The drained set equals
    the batch FULL/RIGHT JOIN with the same time-range condition, folded
    per user into (n_pairs, n_only_purchase, n_only_click).
    """
    from datetime import timedelta

    assert join_type in ("fullOuter", "rightOuter")
    def _sentinels():
        mx = src_df.agg(F.max("ts").alias("m")).collect()[0]["m"]
        s_ts = mx + timedelta(hours=100)
        return [(-1, s_ts, -1, "purchase", 0.0, None),
                (-2, s_ts, -1, "click", 0.0, None)]

    stage_dir = _stage_time_sliced(
        spark,
        src_df,
        stage_dir,
        sentinel_fn=_sentinels,
        cache_key=cache_key,
    )

    def _stream():
        return (
            spark.readStream.schema(src_df.schema)
            .format("parquet")
            .option("path", stage_dir)
            .option("maxFilesPerTrigger", 1)
            .load()
        )

    purchases = (
        _stream()
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    clicks = (
        _stream()
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND "
            "c_ts >= p_ts - INTERVAL 30 MINUTES AND c_ts <= p_ts"
        ),
        join_type,
    )
    name = f"ss2outer_out_{uuid.uuid4().hex[:8]}"
    # 4 state partitions — see run_stream_stream_outer_join
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)
    uid = F.coalesce(F.col("p_user"), F.col("c_user"))
    return (
        spark.table(name)
        .filter(uid >= 0)  # sentinels match only themselves; drop them
        .groupBy(uid.alias("user_id"))
        .agg(
            F.count(F.when(F.col("purchase_id").isNotNull()
                           & F.col("click_id").isNotNull(), 1))
            .cast("bigint").alias("n_pairs"),
            F.count(F.when(F.col("click_id").isNull(), 1))
            .cast("bigint").alias("n_only_purchase"),
            F.count(F.when(F.col("purchase_id").isNull(), 1))
            .cast("bigint").alias("n_only_click"),
        )
        .orderBy("user_id")
    )


def run_transform_with_state_stats(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    timeout_sec: int = 180,
) -> DataFrame:
    """Per-user running stats via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API (SPARK-40434 successor): explicit
    ``ValueState`` obtained from a ``StatefulProcessorHandle`` instead of
    ``applyInPandasWithState``'s single implicit GroupState tuple.

    State is a (count, decimal-sum-as-string) pair: the running sum is
    carried as a ``decimal.Decimal`` serialized to string, added per row
    from the value's shortest float repr — the exact Python mirror of the
    engine's dec_in/dec_out VARCHAR-routing discipline — so the final sum
    is bit-identical to the oracle's DECIMAL(38,12) aggregate no matter
    how the drain batches (float accumulation would drift with batch
    boundaries). The 4-file ``maxFilesPerTrigger=1`` stage forces real
    cross-batch state reuse; update mode re-emits a key each batch it
    appears in, so the sink is folded per key by the row with the highest
    (strictly increasing) count. Python-side work is O(batch rows) simple
    decimal adds inside an Arrow-batched processor — the state logic is
    the point here, not expression throughput.
    """
    import pandas as pd
    from decimal import Decimal

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n bigint, s string")

        def handleInputRows(self, key, rows, timerValues):
            if self._agg.exists():
                n, s = self._agg.get()
                tot = Decimal(s)
            else:
                n, tot = 0, Decimal(0)
            for pdf in rows:
                n += len(pdf)
                for v in pdf["value"]:
                    if pd.notna(v):
                        tot += Decimal(str(float(v)))
            self._agg.update((n, str(tot)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [float(tot)],
                }
            )

        def close(self) -> None:
            pass

    src_df.repartition(4).write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )
    stats = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )
    name = f"tws_out_{uuid.uuid4().hex[:8]}"
    # transformWithState requires the RocksDB state store provider (the
    # default HDFS-backed store does not implement the new API's
    # multi-state/TTL surface) — scoped, like the partition-count conf
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "8"), _scoped_conf(
        spark,
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    ):
        q = (
            stats.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)
    last = F.max(F.struct("n_events", "total_value")).alias("m")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(last)
        .select(
            "user_id",
            F.col("m.n_events").alias("n_events"),
            F.col("m.total_value").alias("total_value"),
        )
        .orderBy("user_id")
    )


def _upsert_counts_fn(target_dir: str):
    """foreachBatch body shared by run_foreachbatch_upsert-style runners:
    aggregate the micro-batch per user and MERGE (full-outer combine +
    atomic directory swap) into the parquet target; sums carried as
    DECIMAL(38,12) so batch boundaries cannot skew the fold.  Replays of a
    committed batch_id are no-ops (``_applied_batch_ids``).  The merge key
    compares with ``eqNullSafe`` (ADVICE r6): groupBy emits at most one
    NULL-key row per batch, and a null-rejecting join would accumulate one
    duplicate NULL row per micro-batch instead of folding it — with dirty
    keys at scale that is unbounded state growth.  The output key is
    ``coalesce(k_prev, k_new)`` (NULL stays NULL; both sides NULL only on
    the matched NULL group)."""
    import os
    import shutil

    def upsert(batch_df, batch_id):
        applied = _applied_batch_ids(target_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: fold already committed, no-op
        agg = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,12)")).alias("sum_value"),
        )
        if os.path.exists(target_dir):
            prev = batch_df.sparkSession.read.parquet(target_dir)
            merged = (
                prev.select(
                    F.col("user_id").alias("k_prev"),
                    F.col("n_events").alias("n0"),
                    F.col("sum_value").alias("s0"),
                )
                .join(
                    agg.withColumnRenamed("user_id", "k_new"),
                    F.col("k_prev").eqNullSafe(F.col("k_new")),
                    "full_outer",
                )
                .select(
                    F.coalesce("k_prev", "k_new").alias("user_id"),
                    (
                        F.coalesce("n0", F.lit(0))
                        + F.coalesce("n_events", F.lit(0))
                    ).alias("n_events"),
                    (
                        F.coalesce(F.col("s0"), F.lit(0).cast("decimal(38,12)"))
                        + F.coalesce(
                            F.col("sum_value"), F.lit(0).cast("decimal(38,12)")
                        )
                    ).cast("decimal(38,12)").alias("sum_value"),
                )
            )
        else:
            merged = agg
        nxt = target_dir + "_next"
        merged.write.mode("overwrite").parquet(nxt)
        _mark_applied(nxt, batch_id, applied)  # commits atomically with swap
        _swap_dir(nxt, target_dir)

    return upsert


def run_checkpoint_recovery(
    spark,
    src_df: DataFrame,
    workdir: str,
) -> DataFrame:
    """Checkpoint RESTART contract: a foreachBatch upsert query is run to
    completion over half the source, STOPPED, more files land in the
    source directory, and the query is STARTED AGAIN with the SAME
    checkpoint location.  The restarted query must process ONLY the new
    files — the checkpoint's file-source log records what was committed,
    so nothing is re-folded into the target and the final state equals
    the one-shot batch aggregate over everything (which is exactly what
    the DuckDB oracle checks; any reprocessing would double-count the
    first half and fail the value compare).

    This is the production upgrade-the-job loop: kill, redeploy, resume
    from checkpoint with no backfill and no duplicates.  At 100 TB the
    same mechanism bounds a restart to the un-committed tail regardless
    of topic/directory history size.  Both phases drain with
    maxFilesPerTrigger=1 so each REALLY iterates micro-batches.
    """
    import os
    import shutil

    stage_dir = os.path.join(workdir, "stage")
    target_dir = os.path.join(workdir, "target")
    ckpt_dir = os.path.join(workdir, "ckpt")  # FIXED across both phases
    for d in (stage_dir, target_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)

    half1 = src_df.filter(F.col("event_id") % 2 == 0)
    half2 = src_df.filter(F.col("event_id") % 2 == 1)
    upsert = _upsert_counts_fn(target_dir)

    def drain_phase(half_df, mode):
        half_df.repartition(4).write.mode(mode).parquet(stage_dir)
        stream = (
            spark.readStream.schema(src_df.schema)
            .format("parquet")
            .option("path", stage_dir)
            .option("maxFilesPerTrigger", 1)
            .load()
        )
        with _scoped_conf(spark, "spark.sql.shuffle.partitions", "8"):
            q = (
                stream.writeStream.foreachBatch(upsert)
                .option("checkpointLocation", ckpt_dir)
                .trigger(availableNow=True)
                .start()
            )
            _drain(q, 180)

    drain_phase(half1, "overwrite")   # phase 1: first half, fresh checkpoint
    drain_phase(half2, "append")      # phase 2: RESTART, same checkpoint —
    # only the appended files may be processed
    return (
        spark.read.parquet(target_dir)
        .select(
            "user_id",
            "n_events",
            F.col("sum_value").cast("double").alias("total_value"),
        )
        .orderBy("user_id")
    )


def run_streaming_quantile_sketch(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    target_dir: str,
    lo: float = 0.0,
    hi: float = 512.0,
    nb: int = 256,
    timeout_sec: int = 180,
) -> DataFrame:
    """Mergeable QUANTILE SKETCH folded at ingest: per micro-batch, the
    256-bucket FIXED-BOUND equi-width histogram of ``value`` is merged
    into parquet state by bucket-wise addition — the linearity that makes
    one-pass quantiles possible on an unbounded stream.  Unlike the batch
    gate (quantile_sketch_gate), the bounds CANNOT be data-dependent
    min/max here: a mergeable-across-batches sketch must fix its bucketing
    before the data arrives (production uses KLL/t-digest for
    bound-free mergeability; fixed bounds are the SQL-parity choice).
    Addition is replay-sensitive, so the applied-batch sidecar
    (``_applied_batch_ids``) commits atomically with each swap.  After the
    drain, p50/p99 midpoint estimates from the merged state are laid next
    to the EXACT distributed percentiles — the same measured-not-claimed
    gate shape as the batch twin.
    """
    import os
    import shutil

    from newyork_taxi_etl_spark.operators import profile as P

    src_df.repartition(4).write.mode("overwrite").parquet(stage_dir)
    shutil.rmtree(target_dir, ignore_errors=True)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )
    w = (hi - lo) / nb
    # Clamped on BOTH ends: values >= hi land in the last bucket, values
    # below lo in bucket 0 (without the lower clamp a value < lo would
    # yield a negative bucket that silently skews the cumulative walk —
    # r7 ADVICE).  The oracle SQL mirrors the same GREATEST/LEAST pair.
    bucket = F.greatest(
        F.lit(0),
        F.least(
            F.floor((F.col("value") - F.lit(lo)) / F.lit(w)).cast("int"),
            F.lit(nb - 1),
        ),
    )

    def fold(batch_df, batch_id):
        applied = _applied_batch_ids(target_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: additive fold must not re-apply
        agg = (
            batch_df.filter(F.col("value").isNotNull())
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        if os.path.exists(target_dir):
            prev = batch_df.sparkSession.read.parquet(target_dir)
            merged = (
                prev.select(F.col("bucket").alias("b0"),
                            F.col("cnt").alias("c0"))
                .join(agg, F.col("b0") == F.col("bucket"), "full_outer")
                .select(
                    F.coalesce("b0", "bucket").alias("bucket"),
                    (
                        F.coalesce("c0", F.lit(0)) + F.coalesce("cnt", F.lit(0))
                    ).cast("bigint").alias("cnt"),
                )
            )
        else:
            merged = agg
        nxt = target_dir + "_next"
        merged.write.mode("overwrite").parquet(nxt)
        _mark_applied(nxt, batch_id, applied)
        _swap_dir(nxt, target_dir)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    from pyspark.sql.window import Window

    hist = spark.read.parquet(target_dir)
    n1 = hist.agg(F.sum("cnt").alias("n"))
    cum = hist.select(
        "bucket", F.sum("cnt").over(Window.orderBy("bucket")).alias("c")
    ).crossJoin(F.broadcast(n1))
    b50 = cum.filter(F.col("c") >= 0.5 * F.col("n")).agg(
        F.min("bucket").alias("b50")
    )
    b99 = cum.filter(F.col("c") >= 0.99 * F.col("n")).agg(
        F.min("bucket").alias("b99")
    )
    exact = P.exact_quantiles(
        src_df.filter(F.col("value").isNotNull()), "value", [0.5, 0.99]
    ).select(
        F.round(F.col("p0_5"), 6).alias("p50_exact"),
        F.round(F.col("p0_99"), 6).alias("p99_exact"),
    )
    row = exact.crossJoin(F.broadcast(b50)).crossJoin(F.broadcast(b99))
    e50 = F.lit(lo) + (F.col("b50") + 0.5) * F.lit(w)
    e99 = F.lit(lo) + (F.col("b99") + 0.5) * F.lit(w)
    return row.select(
        "p50_exact",
        F.round(e50, 6).alias("p50_est"),
        F.round(F.abs(e50 - F.col("p50_exact")) / F.col("p50_exact"), 6)
        .alias("p50_rel_err"),
        "p99_exact",
        F.round(e99, 6).alias("p99_est"),
        F.round(F.abs(e99 - F.col("p99_exact")) / F.col("p99_exact"), 6)
        .alias("p99_rel_err"),
    )


def run_streaming_session_close(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """Streamed SESSION WINDOWS with real closure semantics (append mode):
    a session row is emitted only when the watermark passes its end + gap
    — the engine's proof that no event can still extend it.  This is the
    streaming operator the batch twin (``session_agg`` /
    ``session_window_agg``) evaluates eagerly: here sessions GROW ACROSS
    micro-batches in the state store (UpdatingSessions merge) and flush
    individually as the watermark overtakes them.

    Same staging discipline as the outer-join drains: three time-ordered
    slices (strictly increasing mtimes — the file source would otherwise
    interleave the span and late-drop whole batches under the 1-hour
    watermark) plus a far-future SENTINEL event staged last, which pushes
    the final watermark beyond every real session's end so ALL of them
    close during the bounded drain.  The sentinel's own still-open session
    never emits and is filtered by user_id.  The drained set then equals
    the batch gaps-and-islands sessionization, which the oracle
    value-checks row-for-row (user, session start, event count).
    """
    from datetime import timedelta

    def _sentinels():
        mx = src_df.agg(F.max("ts").alias("m")).collect()[0]["m"]
        return [(-1, mx + timedelta(hours=100), -1, "click", 0.0, None)]

    stage_dir = _stage_time_sliced(
        spark,
        src_df,
        stage_dir,
        sentinel_fn=_sentinels,
        cache_key=cache_key,
    )

    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )
    sessions = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )
    name = f"sessclose_out_{uuid.uuid4().hex[:8]}"
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)
    return (
        spark.table(name)
        .filter(F.col("user_id") >= 0)
        .orderBy("user_id", "session_start")
    )


def run_streaming_cdc_apply(
    spark,
    base_df: DataFrame,
    cdc_df: DataFrame,
    stage_dir: str,
    target_dir: str,
    timeout_sec: int = 180,
) -> DataFrame:
    """Streaming CDC APPLY (the Debezium-consumer pattern): a change feed
    with per-row ops — ``U`` (new value) / ``D`` (tombstone) — drains as
    micro-batches and each batch MERGEs into the parquet target: deletes
    drop the key, updates replace the row, untouched keys carry forward
    (with Delta installed the body is ``MERGE INTO ... WHEN MATCHED AND
    op='D' THEN DELETE WHEN MATCHED THEN UPDATE``).  The feed stages
    hash-split (no time ordering needed — the feed carries at most one op
    per key here; a real feed orders by LSN within key, which
    ``maxFilesPerTrigger`` respects per file).  The merge key compares
    null-safe and replays of a committed batch_id are no-ops
    (``_applied_batch_ids``) — the same fold contract as the upsert
    family.  State after the drain must equal base − deletes ⊎ updates,
    which the oracle recomputes relationally.
    """
    import os
    import shutil

    base_df.write.mode("overwrite").parquet(target_dir + "_base")
    shutil.rmtree(target_dir, ignore_errors=True)
    shutil.copytree(target_dir + "_base", target_dir)
    cdc_df.repartition(4).write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(cdc_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def apply_batch(batch_df, batch_id):
        applied = _applied_batch_ids(target_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: merge already committed
        ss = batch_df.sparkSession
        prev = ss.read.parquet(target_dir)
        ch = batch_df.select(
            F.col("o_orderkey").alias("k"),
            F.col("op"),
            F.col("new_price"),
        )
        merged = (
            prev.join(ch, prev["o_orderkey"].eqNullSafe(ch["k"]), "left")
            .filter(F.coalesce(F.col("op"), F.lit("")) != "D")
            .select(
                "o_orderkey",
                F.when(F.col("op") == "U", F.col("new_price"))
                .otherwise(F.col("o_totalprice"))
                .alias("o_totalprice"),
            )
        )
        nxt = target_dir + "_next"
        merged.write.mode("overwrite").parquet(nxt)
        _mark_applied(nxt, batch_id, applied)
        _swap_dir(nxt, target_dir)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)
    final = spark.read.parquet(target_dir)
    return final.agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_after"),
        F.sum(F.col("o_totalprice").cast("decimal(38,12)")).cast("double")
        .alias("price_checksum"),
        F.count(F.when(F.col("o_totalprice").isNull(), 1)).cast("bigint")
        .alias("null_prices"),
    )


def run_streaming_late_drop(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    watermark: str = "1 hour",
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """Watermark LATE-DATA DROP accounting — the streaming semantic every
    other drain here deliberately avoids (their watermarks exceed the
    corpus span, so nothing drops).  Rows arriving in batch 3 ONLY, with
    ``event_id % 25 == 0``, are re-stamped to the corpus MIN event time
    minus 2 hours: below every possible operative watermark once any
    earlier batch has committed, so the tumbling aggregation MUST drop
    every one of them.  Batches 1-2 plant nothing: the first batch runs
    with the watermark unset, and the append-mode late filter's OPERATIVE
    watermark empirically lags the progress-reported one by a micro-batch,
    so batch-2 lates could still be aggregated.  Stamping below the corpus
    start makes the drop decision edge-free regardless of where in its
    batch a row arrives.

    Batch membership must be TIME-MONOTONE (slice i arrives before slice
    i+1's event times) or real rows in a late batch would fall below the
    watermark the earlier batches advanced and be dropped unintentionally
    — a hash slice fails exactly that way (measured: it drops the whole
    third batch).  The r10 plan got monotone slices from ntile(3) OVER
    (ORDER BY ts, event_id) — a corpus-sized single-partition window.
    Here the same monotone property comes from EQUAL TIME-SPAN tertiles:
    one (min, max) aggregate, then slice = 1 + (epoch_us(ts) - mn) * 3
    DIV span — a pure projection, integer-exact and relationally
    reproducible in the oracle, with no window anywhere.  (Tertiles by
    time span, not by row count — batch SIZES may differ, which the
    drop semantics never depended on.)  The drained window counts
    therefore equal the batch tumbling aggregate over NON-LATE rows
    only, and the dropped total is reported beside it.
    """
    import os
    from datetime import timedelta

    # needed both for the sentinel (staging) and the sentinel-window
    # filter on the drained output
    mx = src_df.agg(F.max("ts").alias("m")).collect()[0]["m"]

    def build(target: str) -> None:
        # lates live ONLY in the 3rd batch, stamped BEFORE the corpus
        # start: below every possible operative watermark once any earlier
        # batch has committed. (Planting in batch 2 is not robust: the
        # late-filter's operative watermark empirically lags the
        # progress-reported one by a batch, so batch-2 lates can still be
        # aggregated-and-emitted.)
        bounds = src_df.agg(
            F.min("ts").alias("m"),
            F.unix_micros(F.min("ts")).alias("mn_us"),
            F.unix_micros(F.max("ts")).alias("mx_us"),
        ).collect()[0]
        mn = bounds["m"]
        mn_us = bounds["mn_us"]
        span = bounds["mx_us"] - bounds["mn_us"] + 1
        sliced = src_df.withColumn(
            "_slice",
            F.expr(
                f"CAST(1 + (unix_micros(ts) - {mn_us}L) * 3 DIV {span}L"
                " AS INT)"
            ),
        ).withColumn(
            "ts",
            F.when(
                (F.col("_slice") == 3) & (F.col("event_id") % 25 == 0),
                F.lit(mn) - F.expr("INTERVAL 2 HOURS"),
            ).otherwise(F.col("ts")),
        )

        def _append_stamped(df, seq):
            before = (
                set(os.listdir(target)) if os.path.exists(target) else set()
            )
            df.coalesce(1).write.mode("append").parquet(target)
            t = 1_600_000_000 + seq * 10
            for f in os.listdir(target):
                if f not in before:
                    os.utime(os.path.join(target, f), (t, t))

        for i in (1, 2, 3):
            _append_stamped(
                sliced.filter(F.col("_slice") == i).drop("_slice"), i
            )

        # APPEND mode is mandatory: complete mode never drops late rows
        # (state is fully retained, watermark unused) — verified
        # empirically before this runner switched. Append emits a window
        # only once the watermark finalizes it, so a far-future sentinel
        # (4th file) must push the final watermark past every real window;
        # the engine's no-data micro-batch then flushes them all. The
        # sentinel's own window is excluded from the counts below.
        sent = local_rows_df(
            spark,
            [(-1, mx + timedelta(hours=100), -1, "click", 0.0, None)],
            src_df.schema,
        )
        _append_stamped(sent, 4)

    stage_dir = _stage_cached(stage_dir, cache_key, build)

    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    name = f"latedrop_out_{uuid.uuid4().hex[:8]}"
    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)
    total = src_df.count()
    out = (
        spark.table(name)
        .filter(F.col("w.start") <= F.lit(mx))  # drop the sentinel window
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum("cnt").cast("bigint").alias("events_emitted"),
        )
    )
    return out.select(
        "n_windows",
        "events_emitted",
        (F.lit(total) - F.col("events_emitted")).cast("bigint")
        .alias("events_dropped_late"),
    )


def run_streaming_linkage_ingest(
    spark,
    docs_df,
    b_df,
    work_dir: str,
    threshold: float = 0.15,
    max_df_frac: float = 0.10,
    n_slices: int = 3,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """Record LINKAGE AT INGEST: incoming records stream in micro-batches
    and each batch is linked against a STATIC reference corpus's
    persisted inverted index — the master-data-management shape (new
    records resolve against the golden table the moment they arrive).

    Determinism by construction: each B record appears exactly once, and
    its best-A match (rank-1 by jaccard desc, doc_id) depends only on the
    static A index — so the drained match table is identical under ANY
    micro-batch partitioning, and one relational oracle covers every
    possible batching.  The hot-shingle cap is computed from the A side
    alone (the only side that exists before the stream starts); appends
    are guarded by the applied-batch sidecar (append-style commit —
    non-atomic, documented in _mark_applied).

    Scale shape: the A index (pruned inverted shingles + per-doc sizes +
    hot list) is built ONCE and persisted; each micro-batch does one
    equi-join of its own shingles against it — at 100 TB the index is a
    partitioned table and the per-batch join shuffles only the batch.
    """
    import os
    import shutil

    from newyork_taxi_etl_spark.functions.text import with_shingles

    idx_dir = os.path.join(work_dir, "a_index")
    stage_dir = os.path.join(work_dir, "b_stage")
    target_dir = os.path.join(work_dir, "matches")
    shutil.rmtree(target_dir, ignore_errors=True)

    # -- static A-side index, built once and persisted (and shared
    # build-once across runs via _stage_cached: the pruned inverted
    # index, hot list and per-doc sizes are a deterministic function of
    # (corpus, max_df_frac)) ---------------------------------------------
    # one shingle pass: the inverted index feeds THREE consumers (hot
    # computation, the persisted index, per-doc sizes) — materialize it
    # once instead of re-tokenizing the corpus per consumer
    def build_index(target: str) -> None:
        sh_a = with_shingles(docs_df, "text", 3).select(
            "doc_id",
            F.col("lang").alias("blk"),
            F.array_distinct("sh").alias("s"),
        )
        inv_a0 = sh_a.select(
            "doc_id", "blk", F.explode("s").alias("g")
        ).localCheckpoint(eager=True)
        n_docs = sh_a.groupBy("blk").agg(F.count(F.lit(1)).alias("n_docs"))
        hot = (
            inv_a0.groupBy("blk", "g")
            .agg(F.count(F.lit(1)).alias("df"))
            .join(n_docs, "blk")
            .filter(F.col("df") > F.col("n_docs") * F.lit(max_df_frac))
            .select("blk", "g")
        )
        inv_a = inv_a0.join(F.broadcast(hot), ["blk", "g"], "left_anti")
        inv_a.write.parquet(os.path.join(target, "inv"))
        hot.write.parquet(os.path.join(target, "hot"))
        (
            inv_a.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_a"))
            .write.parquet(os.path.join(target, "sizes"))
        )

    idx_dir = _stage_cached(
        idx_dir,
        cache_key and f"{cache_key}:a_index{max_df_frac}",
        build_index,
    )

    stage_dir = _stage_cached(
        stage_dir,
        cache_key and f"{cache_key}:b_stage{n_slices}",
        lambda target: b_df.repartition(n_slices)
        .write.mode("overwrite")
        .parquet(target),
    )
    stream = (
        spark.readStream.schema(b_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def link_batch(batch_df, batch_id):
        applied = _applied_batch_ids(target_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: its appends are already committed
        ss = batch_df.sparkSession
        from pyspark.sql import Window

        inv = ss.read.parquet(os.path.join(idx_dir, "inv"))
        hot_t = ss.read.parquet(os.path.join(idx_dir, "hot"))
        sz_a = ss.read.parquet(os.path.join(idx_dir, "sizes"))
        sh_b = with_shingles(batch_df, "text", 3).select(
            "b_id",
            F.col("lang").alias("blk"),
            F.array_distinct("sh").alias("s"),
        )
        inv_b = (
            sh_b.select("b_id", "blk", F.explode("s").alias("g"))
            .join(F.broadcast(hot_t), ["blk", "g"], "left_anti")
        )
        sz_b = inv_b.groupBy("b_id").agg(F.count(F.lit(1)).alias("n_b"))
        pairs = (
            inv_b.join(inv, ["blk", "g"])
            .groupBy("b_id", "doc_id")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
        j = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
        scored = (
            pairs.join(sz_a, "doc_id")
            .join(sz_b, "b_id")
            .filter(j >= F.lit(threshold))
            .select("b_id", "doc_id", j.alias("jaccard"))
        )
        w = Window.partitionBy("b_id").orderBy(
            F.desc("jaccard"), F.col("doc_id")
        )
        best = (
            scored.withColumn("rb", F.row_number().over(w))
            .filter(F.col("rb") == 1)
            .drop("rb")
        )
        os.makedirs(target_dir, exist_ok=True)
        best.write.mode("append").parquet(target_dir)
        _mark_applied(target_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(link_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    out = spark.read.parquet(target_dir)
    return out.select(
        "b_id",
        "doc_id",
        F.round("jaccard", 6).alias("jaccard"),
        ((F.col("b_id") - F.lit(100_000)) == F.col("doc_id")).alias("hit"),
    ).orderBy("b_id")


def run_streaming_reservoir_sample(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    target_dir: str,
    k: int = 64,
    timeout_sec: int = 180,
) -> DataFrame:
    """Bounded UNIFORM SAMPLE maintained at ingest: the deterministic
    distributed reservoir (keep the k smallest md5(event_id) ranks)
    folded across micro-batches — state is the current top-k, merge is
    union + re-top-k.

    Two properties make this the robust streaming sample: the fold is
    IDEMPOTENT (top-k of a union is unchanged by re-merging the same
    batch), so at-least-once redelivery needs NO applied-batch sidecar —
    unlike the additive folds (upsert counts, quantile sketch), a crash
    replay simply converges to the same state; and the hash rank is
    key-determined, so the drained sample equals the BATCH top-k draw
    over the whole corpus exactly (one relational oracle, any batching).
    State is O(k); per batch the source side reduces map-side via the
    TakeOrdered heap before anything shuffles.
    """
    import os
    import shutil

    src_df.repartition(4).write.mode("overwrite").parquet(stage_dir)
    shutil.rmtree(target_dir, ignore_errors=True)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def fold(batch_df, batch_id):
        ss = batch_df.sparkSession
        cand = batch_df.select(
            "event_id",
            "user_id",
            "value",
            F.md5(F.col("event_id").cast("string")).alias("h"),
        ).orderBy("h", "event_id").limit(k)
        if os.path.exists(target_dir):
            prev = ss.read.parquet(target_dir)
            cand = prev.unionByName(cand).orderBy("h", "event_id").limit(k)
        nxt = target_dir + "_next"
        cand.write.mode("overwrite").parquet(nxt)
        _swap_dir(nxt, target_dir)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    from pyspark.sql import Window

    out = spark.read.parquet(target_dir)
    return (
        out.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy("h", "event_id"))
            .cast("int"),
        )
        .select("rk", "event_id", "user_id", "value")
        .orderBy("rk")
    )


def run_streaming_group_reservoir(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    target_dir: str,
    k: int = 8,
    timeout_sec: int = 180,
) -> DataFrame:
    """Per-GROUP bounded uniform sample maintained at ingest: the
    k-smallest-md5-rank reservoir of run_streaming_reservoir_sample,
    stratified by event_type — state is O(groups x k), the merge is a
    per-group windowed top-k (map-side WindowGroupLimit prunes each
    batch before the tiny state union), and the fold stays IDEMPOTENT,
    so replay needs no sidecar.  The streaming twin of the batch
    sample_k_per_group; the drained sample equals the batch per-group
    draw row-for-row under any batching."""
    import os
    import shutil

    from pyspark.sql import Window

    src_df.repartition(4).write.mode("overwrite").parquet(stage_dir)
    shutil.rmtree(target_dir, ignore_errors=True)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )
    w = Window.partitionBy("event_type").orderBy("h", "event_id")

    def topk(df):
        return (
            df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .drop("rk")
        )

    def fold(batch_df, batch_id):
        ss = batch_df.sparkSession
        cand = topk(
            batch_df.select(
                "event_type",
                "event_id",
                "user_id",
                F.md5(F.col("event_id").cast("string")).alias("h"),
            )
        )
        if os.path.exists(target_dir):
            cand = topk(ss.read.parquet(target_dir).unionByName(cand))
        nxt = target_dir + "_next"
        cand.write.mode("overwrite").parquet(nxt)
        _swap_dir(nxt, target_dir)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    out = spark.read.parquet(target_dir)
    return (
        out.withColumn("rk", F.row_number().over(w).cast("int"))
        .select("event_type", "rk", "event_id", "user_id")
        .orderBy("event_type", "rk")
    )


def run_streaming_ann_ingest(
    spark,
    emb_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """VECTOR APPENDS AT INGEST against a persisted IVF index — the
    streaming composition of ``ann_index_incremental_append``: the
    quantizer is trained ONCE on the initial corpus (vec_id % 4 <> 0)
    and persisted with the initial assignments (partitioned by cid);
    the held-out quarter then ARRIVES AS A STREAM, and each micro-batch
    is assigned by the persisted quantizer (read back inside the fold —
    the appender owns no trainer state) and appended to the partitioned
    assignments table, replay-guarded by the applied-batch sidecar
    (append-style commit, non-atomic — documented in _mark_applied).

    Determinism by construction: each appended vector's cid depends only
    on the persisted centroids, so the drained assignments table — and
    therefore the partition-pruned probe run after the drain — is
    IDENTICAL under any micro-batch partitioning, and the from-scratch
    rebuild oracle (_IVF_APPEND_SQL) covers every possible batching.
    Scale shape: per batch one broadcast of the 8-row centroid table +
    one O(batch) partitioned append; the probe reads only the probed
    cid= directories.
    """
    import os
    import shutil

    from pyspark.sql import Window

    from newyork_taxi_etl_spark.operators.clustering import (
        _ARGMIN,
        _SQDIST,
        kmeans_centroids,
    )
    from newyork_taxi_etl_spark.operators import similarity as S

    idx_root = os.path.join(work_dir, "index")
    stage_dir = os.path.join(work_dir, "vec_stage")
    assign_dir = os.path.join(idx_root, "assignments")
    cent_dir = os.path.join(idx_root, "centroids")
    for d in (idx_root, stage_dir):
        shutil.rmtree(d, ignore_errors=True)

    base = emb_df.select(
        "vec_id",
        "embedding",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("_v"),
    )
    initial = base.filter((F.col("vec_id") % 4) != 0)
    arriving = base.filter((F.col("vec_id") % 4) == 0)

    # -- build once: train on the initial corpus, persist both tables ---
    # The trained snapshot (centroids + initial assignments + staged
    # arriving vectors) is deterministic and read-only, so it shares per
    # process (r16); the APPENDED-to assignments table is copied out of
    # the snapshot into the per-run dir (the drain mutates it, and the
    # applied-batch sidecar must start clean every run).
    def _build_snapshot(target: str) -> None:
        os.makedirs(target, exist_ok=True)
        cent = kmeans_centroids(
            emb_df.filter((F.col("vec_id") % 4) != 0), k=8, n_iter=1
        )
        cent_row = cent.agg(
            F.array_sort(F.collect_list(F.struct("cid", "vec"))).alias(
                "cents"
            )
        )
        (
            initial.join(F.broadcast(cent_row), how="cross")
            .withColumn("cid", F.expr(_ARGMIN))
            .select(
                F.col("vec_id").alias("cand_id"),
                F.col("embedding").alias("c_vec"),
                "cid",
            )
            .write.mode("overwrite")
            .partitionBy("cid")
            .parquet(os.path.join(target, "assignments"))
        )
        cent.write.mode("overwrite").parquet(
            os.path.join(target, "centroids")
        )
        arriving.drop("_v").repartition(n_slices).write.mode(
            "overwrite"
        ).parquet(os.path.join(target, "stage"))

    if cache_key is not None:
        snap = _stage_cached(None, cache_key, _build_snapshot)
        os.makedirs(idx_root, exist_ok=True)
        shutil.copytree(os.path.join(snap, "assignments"), assign_dir)
        cent_dir = os.path.join(snap, "centroids")
        stage_dir = os.path.join(snap, "stage")
    else:
        _build_snapshot(work_dir)
        shutil.move(os.path.join(work_dir, "stage"), stage_dir)
        os.makedirs(idx_root, exist_ok=True)
        shutil.move(os.path.join(work_dir, "assignments"), assign_dir)
        shutil.move(os.path.join(work_dir, "centroids"), cent_dir)
    stream = (
        spark.readStream.schema(arriving.drop("_v").schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def append_batch(batch_df, batch_id):
        applied = _applied_batch_ids(assign_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: its appends are already committed
        ss = batch_df.sparkSession
        cent_row_persisted = (
            ss.read.parquet(cent_dir)
            .agg(
                F.array_sort(F.collect_list(F.struct("cid", "vec"))).alias(
                    "cents"
                )
            )
        )
        (
            batch_df.withColumn(
                "_v", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
            )
            .join(F.broadcast(cent_row_persisted), how="cross")
            .withColumn("cid", F.expr(_ARGMIN))
            .select(
                F.col("vec_id").alias("cand_id"),
                F.col("embedding").alias("c_vec"),
                "cid",
            )
            .write.mode("append")
            .partitionBy("cid")
            .parquet(assign_dir)
        )
        _mark_applied(assign_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(append_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    # -- probe the drained table, partition-pruned ----------------------
    cent_t = spark.read.parquet(cent_dir)
    d = F.expr(_SQDIST.format(a="_v", b="cent_vec"))
    wq = Window.partitionBy("query_id").orderBy("d", "cid")
    probes = (
        base.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"),
            "_v",
        )
        .crossJoin(
            F.broadcast(cent_t.select("cid", F.col("vec").alias("cent_vec")))
        )
        .select("query_id", "q_vec", "cid", d.alias("d"))
        .withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= 2)
        .select("query_id", "q_vec", "cid")
    )
    probe_cids = sorted({r["cid"] for r in probes.select("cid").collect()})
    idx_scan = spark.read.parquet(assign_dir).filter(
        F.col("cid").isin(probe_cids)
    )
    scored = (
        idx_scan.join(F.broadcast(probes), "cid")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            S.cosine_expr("q_vec", "c_vec").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def run_streaming_quality_ingest(
    spark,
    docs_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """QUALITY GATING AT INGEST with a PERSISTED learned scorer — the
    third instance of the build-once/apply-per-batch pattern (after the
    ANN index and the linkage index): the logistic quality filter of
    quality_logreg_filter is trained ONCE on the reference corpus and
    its weights persisted as a 4-row table; documents then ARRIVE AS A
    STREAM and each micro-batch is scored by the weights READ BACK from
    the table (the scorer owns no trainer state) and its keep/drop
    decisions appended, replay-guarded by the applied-batch sidecar.

    Determinism by construction: each doc's score depends only on the
    persisted weights, so the drained decision table is identical under
    any batching and the batch-scored relational oracle covers every
    possible batching.  Per batch: one 4-row broadcast + a per-row
    projection — nothing shuffles but the batch's own per-lang counts.
    """
    import os
    import shutil

    from newyork_taxi_etl_spark.operators.logreg import (
        logistic_gd,
        logistic_prob,
    )

    stage_dir = os.path.join(work_dir, "doc_stage")
    weights_dir = os.path.join(work_dir, "weights")
    target_dir = os.path.join(work_dir, "decisions")
    shutil.rmtree(target_dir, ignore_errors=True)

    # build-once artifacts behind the r12 _stage_cached discipline: the
    # 16-step logistic training and the doc stage are deterministic
    # functions of the source corpus — only the read-only inputs are
    # shared; decisions/sidecar stay per-run.  The weights key is
    # deliberately sharable with run_streaming_psi_ingest (identical
    # features, label, steps and lr over the same corpus).
    def build_weights(target: str) -> None:
        toks = F.split(F.col("text"), " ")
        ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        feats = docs_df.select(
            ((F.size(toks) - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
            ((ttr - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
            F.when(F.col("n_chars").between(100, 400), 1.0)
            .otherwise(0.0)
            .alias("x3"),
            F.when((F.size(toks) >= 30) & (ttr >= 0.2), 1.0)
            .otherwise(0.0)
            .alias("y"),
        ).localCheckpoint()
        w = logistic_gd(feats, ["x1", "x2", "x3"], "y", steps=16, lr=4.0)
        local_rows_df(
            spark, [(j, float(wj)) for j, wj in enumerate(w)],
            "j int, w double",
        ).coalesce(1).write.mode("overwrite").parquet(target)

    weights_dir = _stage_cached(
        weights_dir,
        cache_key and f"{cache_key}:logreg_weights",
        build_weights,
    )

    staged = docs_df.select("doc_id", "text", "lang", "n_chars")
    stage_dir = _stage_cached(
        stage_dir,
        cache_key and f"{cache_key}:quality_stage{n_slices}",
        lambda target: staged.repartition(n_slices)
        .write.mode("overwrite")
        .parquet(target),
    )
    stream = (
        spark.readStream.schema(staged.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def score_batch(batch_df, batch_id):
        applied = _applied_batch_ids(target_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: decisions already committed
        ss = batch_df.sparkSession
        wrow = {
            r["j"]: r["w"] for r in ss.read.parquet(weights_dir).collect()
        }
        wv = [wrow[j] for j in range(4)]
        t = F.split(F.col("text"), " ")
        tt = F.size(F.array_distinct(t)).cast("double") / F.size(t)
        scored = batch_df.select(
            "doc_id",
            "lang",
            ((F.size(t) - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
            ((tt - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
            F.when(F.col("n_chars").between(100, 400), 1.0)
            .otherwise(0.0)
            .alias("x3"),
        ).select(
            "doc_id",
            "lang",
            (logistic_prob(wv, ["x1", "x2", "x3"]) >= F.lit(0.5)).alias(
                "keep"
            ),
        )
        os.makedirs(target_dir, exist_ok=True)
        scored.write.mode("append").parquet(target_dir)
        _mark_applied(target_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(score_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    out = spark.read.parquet(target_dir)
    n = F.count(F.lit(1))
    return (
        out.groupBy("lang")
        .agg(
            n.cast("bigint").alias("n_docs"),
            F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_keep"),
            F.round(
                F.sum(F.col("keep").cast("int")).cast("double") / n, 6
            ).alias("keep_frac"),
        )
        .orderBy("lang")
    )


def run_streaming_w1_ingest(
    spark,
    events_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """WASSERSTEIN-1 DRIFT MONITORED AT INGEST — the drift monitor teams
    actually run: the pre-cutoff reference distribution reduces ONCE to
    per-tick counts and persists; post-cutoff events then ARRIVE AS A
    STREAM, and each micro-batch folds its own per-tick counts into the
    state table (an ADDITIVE fold, so it carries the applied-batch
    replay guard — the r7/r8 discipline).  After the drain the exact W1
    computes from reference + accumulated counts via the SAME
    w1_from_counts fold the batch query uses.

    Determinism by construction: per-tick counts are additive across
    any batching, every accumulation is integer, and the final fold is
    the batch query's — so the drained monitor equals
    wasserstein_value_drift BIT-FOR-BIT under any slicing, and the
    batch oracle covers every possible batching.  State is O(distinct
    value ticks) regardless of stream length — the same bound that
    makes the batch statistic scale.
    """
    import os
    import shutil

    from newyork_taxi_etl_spark.queries.behavior import w1_from_counts

    stage_dir = os.path.join(work_dir, "b_stage")
    baseline_dir = os.path.join(work_dir, "baseline_counts")
    counts_dir = os.path.join(work_dir, "stream_counts")
    for d in (stage_dir, baseline_dir, counts_dir):
        shutil.rmtree(d, ignore_errors=True)

    ev = events_df.filter(F.col("value").isNotNull()).select(
        F.col("ts").cast("date").alias("d"),
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    cutoff = F.lit("2024-01-16").cast("date")
    # split with the SAME when/otherwise the batch query's CASE uses:
    # d < cutoff -> reference, ELSE (including NULL d) -> live — so a
    # NULL-ts event lands on exactly one side, matching the batch/oracle
    # routing (a plain d>=cutoff live filter would drop NULL d from BOTH).
    is_ref = F.when(F.col("d") < cutoff, F.lit(True)).otherwise(F.lit(False))
    # reference side: one batch reduction, persisted as the monitor's
    # baseline (a real deployment trains this once per window roll) —
    # shared per process with the staged live side (r16); counts per-run
    baseline_dir = _stage_cached(
        baseline_dir,
        cache_key and f"{cache_key}:w1base",
        lambda target: ev.filter(is_ref)
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ca"))
        .write.mode("overwrite")
        .parquet(target),
    )
    # live side staged as arriving files
    stage_dir = _stage_cached(
        stage_dir,
        cache_key and f"{cache_key}:w1stage{n_slices}",
        lambda target: ev.filter(~is_ref)
        .select("v")
        .repartition(n_slices)
        .write.mode("overwrite")
        .parquet(target),
    )
    stream = (
        spark.readStream.schema("v bigint")
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def fold_batch(batch_df, batch_id):
        applied = _applied_batch_ids(counts_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: its counts are already folded
        part = batch_df.groupBy("v").agg(
            F.count(F.lit(1)).cast("bigint").alias("cb")
        )
        os.makedirs(counts_dir, exist_ok=True)
        part.write.mode("append").parquet(counts_dir)
        _mark_applied(counts_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    ca = spark.read.parquet(baseline_dir)
    cb = (
        spark.read.parquet(counts_dir)
        .groupBy("v")
        .agg(F.sum("cb").cast("bigint").alias("cb"))
    )
    counts = (
        ca.join(cb, "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    return w1_from_counts(counts)


def run_streaming_mmd_ingest(
    spark,
    emb_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """MOMENT-KERNEL MMD DRIFT MONITORED AT INGEST — the kernel twin of
    run_streaming_w1_ingest: embeddings arrive as a stream, and each
    micro-batch folds its per-(split, side, dim) DECIMAL sufficient
    statistics (sx, sxx, cnt — mmd_moment_partials) into the state
    table; the closed-form MMD^2 computes from the accumulated
    statistics after the drain via the SAME mmd2_from_partials finisher
    the batch query uses.

    Decimal addition is associative, so sum-of-batch-sums equals the
    one-pass sum EXACTLY and the drained monitor is bit-identical to
    mmd_moment_drift under any batching — the shared oracle
    value-checks exactly that.  State is O(splits x sides x dims) rows
    (256 here) regardless of stream length; the additive fold carries
    the applied-batch replay guard.
    """
    import os
    import shutil

    from newyork_taxi_etl_spark.queries.similarity import (
        mmd2_from_partials,
        mmd_moment_partials,
    )

    stage_dir = os.path.join(work_dir, "emb_stage")
    state_dir = os.path.join(work_dir, "mmd_state")
    for d in (stage_dir, state_dir):
        shutil.rmtree(d, ignore_errors=True)

    stage_dir = _stage_cached(
        stage_dir,
        cache_key and f"{cache_key}:mmdstage{n_slices}",
        lambda target: emb_df.select("vec_id", "label", "embedding")
        .repartition(n_slices)
        .write.mode("overwrite")
        .parquet(target),
    )
    stream = (
        spark.readStream.schema(
            "vec_id bigint, label int, embedding array<float>"
        )
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def fold_batch(batch_df, batch_id):
        applied = _applied_batch_ids(state_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: its statistics are already folded
        par = mmd_moment_partials(
            batch_df.withColumn(
                "side", F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0)
            ),
            "side",
        ).select(F.lit("parity_null").alias("split"), "*")
        lab = mmd_moment_partials(
            batch_df.withColumn(
                "side", F.when(F.col("label") == 0, 1).otherwise(0)
            ),
            "side",
        ).select(F.lit("label0").alias("split"), "*")
        os.makedirs(state_dir, exist_ok=True)
        par.unionByName(lab).write.mode("append").parquet(state_dir)
        _mark_applied(state_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    state = spark.read.parquet(state_dir)
    out = None
    for split in ("label0", "parity_null"):
        row = mmd2_from_partials(
            state.filter(F.col("split") == split).drop("split")
        ).select(F.lit(split).alias("split"), "*")
        out = row if out is None else out.unionByName(row)
    return out.orderBy("split")


def run_streaming_psi_ingest(
    spark,
    docs_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """CALIBRATION-DRIFT (PSI) MONITORING AT INGEST — the fourth
    build-once/apply-per-batch instance (ANN index, linkage index,
    quality gate, now the drift alarm over the gate's own scores): the
    logistic scorer trains ONCE on the reference corpus and persists its
    weights; documents then ARRIVE AS A STREAM and each micro-batch
    folds its own (source, score-decile-bin) counts into the additive
    state table, replay-guarded by the applied-batch sidecar.  After the
    drain the per-domain PSI computes from the accumulated counts via
    the SAME psi_from_source_counts fold the batch query
    (quality_psi_by_domain) uses — counts are additive integers, so the
    drained monitor equals the batch statistic bit-for-bit under any
    batching and the batch oracle covers every slicing.  State is
    O(sources x 10 bins) regardless of stream length.
    """
    import os
    import shutil

    from newyork_taxi_etl_spark.operators.logreg import logistic_gd
    from newyork_taxi_etl_spark.queries.curation import (
        _scored_bins,
        psi_from_source_counts,
    )

    stage_dir = os.path.join(work_dir, "doc_stage")
    weights_dir = os.path.join(work_dir, "weights")
    counts_dir = os.path.join(work_dir, "bin_counts")
    shutil.rmtree(counts_dir, ignore_errors=True)

    # the training is IDENTICAL to run_streaming_quality_ingest's
    # (features, label, steps, lr, corpus) — same ":logreg_weights"
    # cache key, so the two monitors share one trained scorer build
    def build_weights(target: str) -> None:
        toks = F.split(F.col("text"), " ")
        ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        feats = docs_df.select(
            ((F.size(toks) - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
            ((ttr - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
            F.when(F.col("n_chars").between(100, 400), 1.0)
            .otherwise(0.0)
            .alias("x3"),
            F.when((F.size(toks) >= 30) & (ttr >= 0.2), 1.0)
            .otherwise(0.0)
            .alias("y"),
        ).localCheckpoint()
        w = logistic_gd(feats, ["x1", "x2", "x3"], "y", steps=16, lr=4.0)
        local_rows_df(
            spark, [(j, float(wj)) for j, wj in enumerate(w)],
            "j int, w double",
        ).coalesce(1).write.mode("overwrite").parquet(target)

    weights_dir = _stage_cached(
        weights_dir,
        cache_key and f"{cache_key}:logreg_weights",
        build_weights,
    )

    staged = docs_df.select("doc_id", "source", "text", "n_chars")
    stage_dir = _stage_cached(
        stage_dir,
        cache_key and f"{cache_key}:psi_stage{n_slices}",
        lambda target: staged.repartition(n_slices)
        .write.mode("overwrite")
        .parquet(target),
    )
    stream = (
        spark.readStream.schema(staged.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def fold_batch(batch_df, batch_id):
        applied = _applied_batch_ids(counts_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: its counts are already folded
        ss = batch_df.sparkSession
        wrow = {
            r["j"]: r["w"] for r in ss.read.parquet(weights_dir).collect()
        }
        wv = [wrow[j] for j in range(4)]
        part = (
            _scored_bins(batch_df, wv)
            .groupBy("source", "bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        os.makedirs(counts_dir, exist_ok=True)
        part.write.mode("append").parquet(counts_dir)
        _mark_applied(counts_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    counts = (
        spark.read.parquet(counts_dir)
        .groupBy("source", "bin")
        .agg(F.sum("n").alias("n"))
    )
    return psi_from_source_counts(counts)


#: 3-gram shingle list over the bound token array _t (the one-reference
#: slice/array_join form; empty for docs under 3 tokens)
_SH3_EXPR = (
    "CASE WHEN size(_t) >= 3 THEN transform(sequence(1, size(_t) - 2), "
    "i -> array_join(slice(_t, i, 3), ' ')) ELSE array() END"
)


def run_streaming_fm_ingest(
    spark,
    docs_df: DataFrame,
    work_dir: str,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """DISTINCT-TOKEN GROWTH CURVE AT INGEST via a LogLog sketch (Durand
    & Flajolet 2003, the max-rank descendant of Flajolet-Martin 1985) —
    the vocabulary-growth monitor novel_ngram_growth answers exactly,
    here answered in O(64) state: each token hashes to one of m=64
    groups (low 6 bits) and contributes rho = 1 + trailing-zero count of
    the remaining 42 hash bits; the sketch keeps MAX(rho) per group — a
    commutative idempotent monoid, so the per-batch fold is
    replay-tolerant BY ALGEBRA on top of the applied-batch guard, and
    the drained state is batch-order-independent.  The growth curve
    reads the state after each batch prefix: estimate = alpha * m *
    2^(mean max-rank), alpha = 0.39701 (the m -> inf LogLog constant;
    fine at m=64 for a MONITOR — the true prefix distinct count is
    reported beside it as the measured honesty column).

    Batch membership is the Knuth hash of doc_id mod 3 (deterministic
    sets, so the oracle reproduces every prefix relationally); files are
    mtime-stamped so the parquet source delivers them in slice order.
    Integer max-ranks make the fold bit-exact cross-engine; the only
    floats are the final pow/round.
    """
    import os
    import shutil

    from newyork_taxi_etl_spark.operators.sampling import hash_bucket

    stage_dir = os.path.join(work_dir, "tok_stage")
    state_dir = os.path.join(work_dir, "fm_state")
    for d in (stage_dir, state_dir):
        shutil.rmtree(d, ignore_errors=True)

    sliced = docs_df.select(
        (hash_bucket("doc_id", 3) + 1).cast("int").alias("b"),
        "text",
    )

    def _build_stage(target: str) -> None:
        def _append_stamped(df, seq):
            before = (
                set(os.listdir(target)) if os.path.exists(target) else set()
            )
            df.coalesce(1).write.mode("append").parquet(target)
            t = 1_600_000_000 + seq * 10
            for f in os.listdir(target):
                if f not in before:
                    os.utime(os.path.join(target, f), (t, t))

        for i in (1, 2, 3):
            _append_stamped(sliced.filter(F.col("b") == i).select("text"), i)

    # fixed deterministic mtimes survive the cache's atomic rename, so the
    # shared stage delivers the identical slice order (r16)
    stage_dir = _stage_cached(
        stage_dir, cache_key and f"{cache_key}:fmstage3", _build_stage
    )

    stream = (
        spark.readStream.schema("text string")
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    h2 = "(hv div 64)"
    rho = (
        f"CASE WHEN {h2} = 0 THEN 43 "
        f"ELSE CAST(floor(log2({h2} & -{h2})) AS INT) + 1 END"
    )

    def fold_batch(batch_df, batch_id):
        applied = _applied_batch_ids(state_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: max-rho fold already applied
        part = (
            batch_df.withColumn("_t", F.split("text", " "))
            .select(F.explode(F.expr(_SH3_EXPR)).alias("tok"))
            .select(
                F.expr(
                    "CAST(conv(substring(md5(tok), 1, 12), 16, 10)"
                    " AS BIGINT)"
                ).alias("hv")
            )
            .select(
                F.expr("pmod(hv, 64)").cast("int").alias("g"),
                F.expr(rho).alias("rho"),
            )
            .groupBy("g")
            .agg(F.max("rho").alias("m"))
            .select(F.lit(int(batch_id) + 1).alias("b"), "g", "m")
        )
        os.makedirs(state_dir, exist_ok=True)
        part.write.mode("append").parquet(state_dir)
        _mark_applied(state_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    state = spark.read.parquet(state_dir)
    prefixes = spark.range(1, 4).select(F.col("id").cast("int").alias("p"))
    grid = prefixes.crossJoin(
        spark.range(0, 64).select(F.col("id").cast("int").alias("g"))
    )
    mx = (
        grid.join(
            state,
            (state["g"] == grid["g"]) & (state["b"] <= grid["p"]),
            "left",
        )
        .groupBy(grid["p"], grid["g"])
        .agg(F.coalesce(F.max("m"), F.lit(0)).alias("m"))
    )
    est = mx.groupBy("p").agg(
        F.round(
            F.lit(0.39701 * 64)
            * F.pow(F.lit(2.0), F.sum("m").cast("double") / F.lit(64.0)),
            6,
        ).alias("fm_estimate")
    )
    toks = sliced.withColumn("_t", F.split("text", " ")).select(
        "b", F.explode(F.expr(_SH3_EXPR)).alias("tok")
    )
    truth = (
        prefixes.join(toks, toks["b"] <= prefixes["p"], "left")
        .groupBy("p")
        .agg(F.countDistinct("tok").cast("bigint").alias("true_distinct"))
    )
    return (
        est.join(truth, "p")
        .select(
            F.col("p").alias("batch_seq"),
            "fm_estimate",
            "true_distinct",
            F.round(
                F.abs(F.col("fm_estimate") - F.col("true_distinct"))
                / F.col("true_distinct"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("batch_seq")
    )


def run_streaming_dsir_ingest(
    spark,
    docs_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """DSIR SELECTION AT INGEST — the sixth build-once/apply-per-batch
    instance: the 64-bucket hashed-n-gram log-ratio table (Xie et al.
    2023) trains ONCE on the reference corpus and persists; documents
    then ARRIVE AS A STREAM, each micro-batch scores its own docs
    against the static table (per-doc importance weights are final on
    arrival: docs arrive whole and the model is frozen) and folds
    per-language partials — n_docs, DECIMAL(38,12) sum of weights,
    n_selected — into the additive state table, replay-guarded by the
    applied-batch sidecar.  After the drain the per-language profile
    recomposes from the partials with the batch query's exact algebra:
    decimal sums are order- and batching-independent, so drained ==
    batch (dsir_importance_select) bit-for-bit under any slicing and
    the batch oracle covers every batching.  State is O(languages)."""
    import os
    import shutil

    from newyork_taxi_etl_spark.queries.curation import (
        _dsir_buckets,
        _dsir_doc_weights,
        _dsir_lr_tab,
    )

    stage_dir = os.path.join(work_dir, "doc_stage")
    model_dir = os.path.join(work_dir, "lr_tab")
    parts_dir = os.path.join(work_dir, "lang_partials")
    for d in (stage_dir, model_dir, parts_dir):
        shutil.rmtree(d, ignore_errors=True)

    # build once: the 64-row log-ratio model, persisted as the serving
    # artifact (at scale: a tiny table every executor broadcasts) —
    # shared per process with the staged docs (r16); partials per-run
    model_dir = _stage_cached(
        model_dir,
        cache_key and f"{cache_key}:dsirmodel",
        lambda target: _dsir_lr_tab(_dsir_buckets(docs_df))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(target),
    )

    staged = docs_df.select("doc_id", "lang", "text")
    stage_dir = _stage_cached(
        stage_dir,
        cache_key and f"{cache_key}:dsirstage{n_slices}",
        lambda target: staged.repartition(n_slices)
        .write.mode("overwrite")
        .parquet(target),
    )
    stream = (
        spark.readStream.schema(staged.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def fold_batch(batch_df, batch_id):
        applied = _applied_batch_ids(parts_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: its partials are already folded
        ss = batch_df.sparkSession
        lr_tab = ss.read.parquet(model_dir)
        per_doc = _dsir_doc_weights(_dsir_buckets(batch_df), lr_tab)
        part = per_doc.groupBy("lang").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("w").cast("decimal(38,12)")).alias("sum_w"),
            F.sum((F.col("w") > 0).cast("int"))
            .cast("bigint")
            .alias("n_selected"),
        )
        os.makedirs(parts_dir, exist_ok=True)
        part.write.mode("append").parquet(parts_dir)
        _mark_applied(parts_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    agg = (
        spark.read.parquet(parts_dir)
        .groupBy("lang")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("sum_w").alias("sum_w"),
            F.sum("n_selected").cast("bigint").alias("n_selected"),
        )
    )
    # identical final algebra to _dsir_lang_profile / avg_exact: the
    # decimal total casts to double BEFORE the division
    return agg.select(
        "lang",
        "n_docs",
        F.round(
            (F.col("sum_w").cast("double") / F.col("n_docs")).cast(
                "double"
            ),
            6,
        ).alias("avg_logweight"),
        "n_selected",
        F.round(
            F.col("n_selected") / F.col("n_docs").cast("double"), 6
        ).alias("selected_share"),
    ).orderBy("lang")


def run_streaming_funnel_ingest(
    spark,
    docs_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
) -> DataFrame:
    """QUALITY-RULE FUNNEL AT INGEST — the seventh per-batch fold, and
    the first with NO build phase: every funnel column is a per-doc-
    independent integer sum (see _qr_stage_counts), so each micro-batch
    computes its own 5-row stage table and the state fold is plain
    addition, replay-guarded by the applied-batch sidecar.  Drained ==
    batch bit-for-bit under any slicing (integer sums commute); state is
    O(rules)."""
    import os
    import shutil

    from newyork_taxi_etl_spark.queries.text import (
        _qr_finalize,
        _qr_stage_counts,
        _qr_stats,
    )

    stage_dir = os.path.join(work_dir, "doc_stage")
    parts_dir = os.path.join(work_dir, "stage_partials")
    for d in (stage_dir, parts_dir):
        shutil.rmtree(d, ignore_errors=True)

    staged = docs_df.select("doc_id", "n_chars", "text")
    staged.repartition(n_slices).write.parquet(stage_dir)
    stream = (
        spark.readStream.schema(staged.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def fold_batch(batch_df, batch_id):
        applied = _applied_batch_ids(parts_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: its partials are already folded
        part = _qr_stage_counts(_qr_stats(batch_df))
        os.makedirs(parts_dir, exist_ok=True)
        part.write.mode("append").parquet(parts_dir)
        _mark_applied(parts_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    counts = (
        spark.read.parquet(parts_dir)
        .groupBy("stage", "rule")
        .agg(
            F.sum("failed_alone").cast("bigint").alias("failed_alone"),
            F.sum("killed_at_stage").cast("bigint").alias("killed_at_stage"),
            F.sum("survivors").cast("bigint").alias("survivors"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
        )
    )
    return _qr_finalize(counts)


def run_streaming_decon_ingest(
    spark,
    docs_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """SPAN-LEVEL DECONTAMINATION AT INGEST — the fifth
    build-once/apply-per-batch instance: the benchmark's pruned
    positional 8-gram index persists ONCE (its hot-gram cap is a
    property of the index alone — bench grams occurring >64 times in
    the BENCH — so nothing about the stream is needed to build it);
    corpus documents then ARRIVE AS A STREAM and each micro-batch joins
    the static index, folds maximal verbatim runs per (bench doc,
    corpus doc, diagonal), and appends its per-pair run rows,
    replay-guarded.  A run lives entirely inside one document and a
    document arrives whole in one batch, so per-pair rows are final on
    append — the drained top-20 equals the batch query
    (decontamination_exact_substring) bit-for-bit under any slicing,
    and the batch oracle covers every batching.  Per batch: one
    index join + a window bounded by the batch's own match count.
    """
    import os
    import shutil

    from newyork_taxi_etl_spark.queries.curation import (
        _decon_bench_index,
        _decon_pos_grams,
        _decon_runs,
        _decon_top,
    )

    stage_dir = os.path.join(work_dir, "doc_stage")
    index_dir = os.path.join(work_dir, "bench_index")
    runs_dir = os.path.join(work_dir, "run_rows")
    for d in (stage_dir, index_dir, runs_dir):
        shutil.rmtree(d, ignore_errors=True)

    # build-once artifacts (static bench index + read-only staged docs)
    # share per process like the other drains (r16); run_rows/checkpoint
    # stay per-run
    index_dir = _stage_cached(
        index_dir,
        cache_key and f"{cache_key}:deconidx",
        lambda target: _decon_bench_index(docs_df)
        .write.mode("overwrite")
        .parquet(target),
    )

    # any slicing works — per-doc rows are final on append — so the stage
    # is a plain n_slices-file write, no membership column needed
    stage_dir = _stage_cached(
        stage_dir,
        cache_key and f"{cache_key}:deconstage{n_slices}",
        lambda target: docs_df.filter(F.col("doc_id") % 50 != 0)
        .select("doc_id", "text")
        .repartition(n_slices)
        .write.mode("overwrite")
        .parquet(target),
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def fold_batch(batch_df, batch_id):
        applied = _applied_batch_ids(runs_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: its run rows are already final
        ss = batch_df.sparkSession
        index = ss.read.parquet(index_dir)
        part = _decon_runs(index, _decon_pos_grams(batch_df)).select(
            "bench_id", "corpus_id", "run_tokens"
        )
        os.makedirs(runs_dir, exist_ok=True)
        part.write.mode("append").parquet(runs_dir)
        _mark_applied(runs_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    return _decon_top(spark.read.parquet(runs_dir))


def run_streaming_char_coverage_ingest(
    spark,
    docs_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """CHARACTER-COVERAGE AT INGEST — the eighth per-batch fold, second
    with no build phase: each micro-batch reduces to its own
    (lang, char) frequency partial (``_char_counts`` — the batch
    query's one corpus-sized pass) and the state fold is plain integer
    addition, replay-guarded by the applied-batch sidecar.  Integer
    sums commute, so the drained coverage budget equals the one-shot
    batch audit (``char_coverage_budget``) bit-for-bit under ANY
    slicing and the batch oracle covers every batching.  This is how a
    crawl actually discovers its alphabet: codepoint counts update as
    documents arrive, and the 99.5% budget (which rare chars become
    <unk>/byte-fallback) firms up long before tokenizer training.
    State is O(langs x alphabet); the coverage windows run at drain
    time over that table, never over character instances."""
    import os
    import shutil

    from newyork_taxi_etl_spark.queries.text import (
        _char_counts,
        _char_coverage_finalize,
    )

    stage_dir = os.path.join(work_dir, "doc_stage")
    parts_dir = os.path.join(work_dir, "char_partials")
    for d in (stage_dir, parts_dir):
        shutil.rmtree(d, ignore_errors=True)

    staged = docs_df.select("doc_id", "lang", "text")
    stage_dir = _stage_cached(
        stage_dir,
        cache_key and f"{cache_key}:charstage{n_slices}",
        lambda target: staged.repartition(n_slices)
        .write.mode("overwrite")
        .parquet(target),
    )
    stream = (
        spark.readStream.schema(staged.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def fold_batch(batch_df, batch_id):
        applied = _applied_batch_ids(parts_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: its partials are already folded
        part = _char_counts(batch_df)
        os.makedirs(parts_dir, exist_ok=True)
        part.write.mode("append").parquet(parts_dir)
        _mark_applied(parts_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    counts = (
        spark.read.parquet(parts_dir)
        .groupBy("lang", "ch")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    return _char_coverage_finalize(counts)


def run_streaming_heavy_hitters(
    spark,
    docs_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
) -> DataFrame:
    """PHI-HEAVY TOKENS AT INGEST — the ninth per-batch fold: each
    micro-batch reduces to its (token, count) integer partial, the
    state fold is plain addition behind the applied-batch sidecar, and
    the drain reports tokens whose EXACT total crosses phi = 0.5% of
    all token instances (integer compare: cnt*10000 >= 50*N), top-20
    by (count desc, token asc).  Integer sums commute -> drained ==
    batch bit-for-bit under any slicing.  State is O(vocab): exact is
    the right answer for bounded vocabularies (event types, domains,
    zone ids — this engine's monitors); for open web vocab the
    bounded-state path is the CMS gate (freq_tokens_cms), and the
    pigeonhole fact that any phi-heavy token must be phi-heavy in at
    least one batch makes per-batch candidates a sound prefilter when
    vocab-sized state is too big."""
    import os
    import shutil

    stage_dir = os.path.join(work_dir, "doc_stage")
    parts_dir = os.path.join(work_dir, "hh_partials")
    for d in (stage_dir, parts_dir):
        shutil.rmtree(d, ignore_errors=True)

    staged = docs_df.select("doc_id", "text")
    staged.repartition(n_slices).write.parquet(stage_dir)
    stream = (
        spark.readStream.schema(staged.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def fold_batch(batch_df, batch_id):
        applied = _applied_batch_ids(parts_dir)
        if int(batch_id) in applied:
            return
        part = (
            batch_df.select(
                F.explode(F.split(F.lower("text"), " ")).alias("tok")
            )
            .filter(F.col("tok") != "")
            .groupBy("tok")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        os.makedirs(parts_dir, exist_ok=True)
        part.write.mode("append").parquet(parts_dir)
        _mark_applied(parts_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    counts = (
        spark.read.parquet(parts_dir)
        .groupBy("tok")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    from pyspark.sql import Window

    total = counts.agg(F.sum("cnt").cast("bigint").alias("n_total"))
    heavy = (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * 10000 >= 50 * F.col("n_total"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    return (
        heavy.select(
            F.row_number().over(w).cast("bigint").alias("rank"),
            "tok",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("n_total"), 6).alias(
                "share"
            ),
        )
        .filter(F.col("rank") <= 20)
        .orderBy("rank")
    )


def run_streaming_lcp_depth_ingest(
    spark,
    docs_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """SUFFIX-LCP REPETITION DEPTH AT INGEST — the tenth per-batch fold
    (third with no build phase): each micro-batch reduces to its own
    (lang, depth, gram) partial of (cnt, min doc_id, max doc_id) via the
    batch query's one corpus-sized pass (``_lcp_gram_stats``), and the
    state fold is SUM/MIN/MAX — associative AND commutative, so the
    drained profile equals the one-shot batch audit bit-for-bit under
    any slicing; appends are replay-guarded by the applied-batch
    sidecar.  State is O(depths x gram vocabulary), the exact-profile
    cost (CMS is the bounded-state alternative); the finalize windows
    run over the folded vocabulary table only."""
    import os
    import shutil

    from newyork_taxi_etl_spark.queries.curation import (
        _lcp_finalize,
        _lcp_gram_stats,
    )

    stage_dir = os.path.join(work_dir, "doc_stage")
    parts_dir = os.path.join(work_dir, "lcp_partials")
    shutil.rmtree(parts_dir, ignore_errors=True)

    staged = docs_df.select("doc_id", "lang", "text")
    stage_dir = _stage_cached(
        stage_dir,
        cache_key and f"{cache_key}:lcp_stage{n_slices}",
        lambda target: staged.repartition(n_slices)
        .write.mode("overwrite")
        .parquet(target),
    )
    stream = (
        spark.readStream.schema(staged.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def fold_batch(batch_df, batch_id):
        applied = _applied_batch_ids(parts_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: its partials are already folded
        part = _lcp_gram_stats(batch_df)
        os.makedirs(parts_dir, exist_ok=True)
        part.write.mode("append").parquet(parts_dir)
        _mark_applied(parts_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    folded = (
        spark.read.parquet(parts_dir)
        .groupBy("lang", "d", "gram")
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return _lcp_finalize(folded)


def run_streaming_doremi_ingest(
    spark,
    docs_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """DoReMi-style domain reweighting AT INGEST — the eleventh
    per-batch fold: per-batch (source, token) integer term-frequency
    partials fold additively (replay-guarded by the applied-batch
    sidecar); models and the excess-loss softmax run at drain via the
    batch query's own _doremi_from_tf finalize, so the drained weights
    equal the one-shot batch answer bit-for-bit under any slicing."""
    import os
    import shutil

    from newyork_taxi_etl_spark.queries.curation import (
        _doremi_from_tf,
        _doremi_tf,
    )

    stage_dir = os.path.join(work_dir, "doc_stage")
    parts_dir = os.path.join(work_dir, "tf_partials")
    shutil.rmtree(parts_dir, ignore_errors=True)

    staged = docs_df.select("doc_id", "source", "text")
    stage_dir = _stage_cached(
        stage_dir,
        cache_key and f"{cache_key}:doremi_stage{n_slices}",
        lambda target: staged.repartition(n_slices)
        .write.mode("overwrite")
        .parquet(target),
    )
    stream = (
        spark.readStream.schema(staged.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def fold_batch(batch_df, batch_id):
        applied = _applied_batch_ids(parts_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: its partials are already folded
        part = _doremi_tf(batch_df)
        os.makedirs(parts_dir, exist_ok=True)
        part.write.mode("append").parquet(parts_dir)
        _mark_applied(parts_dir, batch_id, applied)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    folded = (
        spark.read.parquet(parts_dir)
        .groupBy("source", "tok")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    return _doremi_from_tf(folded)


def run_streaming_bloom_ingest(
    spark,
    docs_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """BLOOM-GATE DEDUP AT INGEST — the twelfth per-batch fold, and the
    shape the Bloom filter exists FOR: the bit array (here the exact
    relational image of one: per bit position, the lowest doc_id that
    set it) rides as bounded state while documents stream past, each
    micro-batch flags its docs against bits set by EARLIER docs (prior
    batches' state plus lower-id docs in the same batch) and then folds
    its own bits in.  Alongside the bit state the fold keeps the
    normalized-text first-seen table (the exact-dup ground truth) so
    the drained ledger carries the same false-positive accounting as
    the batch gate.

    Determinism by construction: docs stage as doc_id-CONTIGUOUS slices
    processed in id order (ingest order — production doc_ids are
    assigned monotonically at ingest), so "some setter with a lower
    doc_id exists" computes incrementally as min(prior-state first_id,
    batch-internal min) and the drained decisions equal
    dedup_bloom_gate's relational formulation BIT-FOR-BIT under any
    slice count (2-vs-5-slice equality pytested).  All three state
    tables (bits, norms, decisions) live in ONE swap-generation
    directory, so the fold and its replay watermark commit in a single
    atomic rename.  State split (r14 verdict item 6): the DEPLOYABLE
    gate state is the bit table alone — O(m) bounded, n_bits_set <= m
    — while the norms first-seen table is the AUDIT SIDECAR
    (O(distinct norms); it exists only to ground-truth false positives
    and a production gate ships without it) and the decisions ledger
    is per-doc (a production deployment appends it transactionally
    instead of copying generations).  The drained ledger reports
    n_bits_set and n_norms_audit side by side so the split is visible.
    """
    import os
    import shutil

    from newyork_taxi_etl_spark.queries.dedup import (
        _BLOOM_K,
        _BLOOM_M,
    )

    stage_dir = os.path.join(work_dir, "doc_stage")
    state_dir = os.path.join(work_dir, "bloom_state")
    shutil.rmtree(state_dir, ignore_errors=True)

    d = docs_df.select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("norm")
    )

    def build_stage(target: str) -> None:
        # doc_id-contiguous ranges; partition i writes part-0000i, and
        # ascending mtimes make the file source deliver them in id order
        d.repartitionByRange(n_slices, "doc_id").write.mode(
            "overwrite"
        ).parquet(target)
        files = sorted(
            f for f in os.listdir(target) if f.endswith(".parquet")
        )
        for i, f in enumerate(files):
            t = 1_600_000_000 + (i + 1) * 10
            os.utime(os.path.join(target, f), (t, t))

    # the slice count is part of the staged layout, so it is part of the
    # key (r14 ADVICE: a hardcoded ":stage3" suffix at the caller served
    # a stale 3-slice staging under any other n_slices)
    stage_dir = _stage_cached(
        stage_dir,
        cache_key and f"{cache_key}:bloom_stage{n_slices}",
        build_stage,
    )

    stream = (
        spark.readStream.schema(d.schema)
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    pos_of = F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}|"), F.col("norm"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(_BLOOM_M),
            )
            for i in range(_BLOOM_K)
        ]
    )

    def fold_batch(batch_df, batch_id):
        applied = _applied_batch_ids(state_dir)
        if int(batch_id) in applied:
            return
        ss = batch_df.sparkSession
        have_state = os.path.exists(os.path.join(state_dir, "bits"))
        if have_state:
            bits = ss.read.parquet(os.path.join(state_dir, "bits"))
            norms = ss.read.parquet(os.path.join(state_dir, "norms"))
            dec = ss.read.parquet(os.path.join(state_dir, "decisions"))
        else:
            bits = local_rows_df(ss, [], "p bigint, first_id bigint")
            norms = local_rows_df(
                ss, [], "norm string, first_id bigint"
            )
            dec = local_rows_df(
                ss, [], "doc_id bigint, flagged int, is_dup int"
            )

        batch = batch_df.select("doc_id", "norm").localCheckpoint()
        pos = (
            batch.select("doc_id", F.explode(pos_of).alias("p"))
            .distinct()
            .localCheckpoint()
        )
        bmin = pos.groupBy("p").agg(F.min("doc_id").alias("bmin"))
        cov = (
            pos.join(F.broadcast(bits), "p", "left")
            .join(F.broadcast(bmin), "p")
            .groupBy("doc_id")
            .agg(
                F.min(
                    (
                        (
                            F.col("first_id").isNotNull()
                            & (F.col("first_id") < F.col("doc_id"))
                        )
                        | (F.col("bmin") < F.col("doc_id"))
                    ).cast("int")
                ).alias("flagged")
            )
        )
        nmin = batch.groupBy("norm").agg(F.min("doc_id").alias("nmin"))
        dup = (
            batch.join(F.broadcast(norms), "norm", "left")
            .join(F.broadcast(nmin), "norm")
            .select(
                "doc_id",
                (
                    F.col("first_id").isNotNull()
                    | (F.col("nmin") < F.col("doc_id"))
                )
                .cast("int")
                .alias("is_dup"),
            )
        )
        new_dec = cov.join(dup, "doc_id")
        next_bits = (
            bits.unionByName(
                bmin.select("p", F.col("bmin").alias("first_id"))
            )
            .groupBy("p")
            .agg(F.min("first_id").alias("first_id"))
        )
        next_norms = (
            norms.unionByName(
                nmin.select("norm", F.col("nmin").alias("first_id"))
            )
            .groupBy("norm")
            .agg(F.min("first_id").alias("first_id"))
        )
        nxt = state_dir + "_next"
        shutil.rmtree(nxt, ignore_errors=True)
        next_bits.write.parquet(os.path.join(nxt, "bits"))
        next_norms.write.parquet(os.path.join(nxt, "norms"))
        dec.unionByName(new_dec).write.parquet(
            os.path.join(nxt, "decisions")
        )
        _mark_applied(nxt, batch_id, applied)
        _swap_dir(nxt, state_dir)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    flags = spark.read.parquet(os.path.join(state_dir, "decisions"))
    bits_n = (
        spark.read.parquet(os.path.join(state_dir, "bits"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_bits"))
    )
    # n_norms_audit sizes the AUDIT SIDECAR, not the gate: the deployable
    # Bloom state is the O(m)-bounded bit table (n_bits_set <= m =
    # _BLOOM_M); the norms first-seen table exists only to ground-truth
    # false positives and grows O(distinct norms) — a production gate
    # ships without it.  Reporting both side by side keeps that split
    # visible in the drained ledger (r14 verdict item 6).
    norms_n = (
        spark.read.parquet(os.path.join(state_dir, "norms"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_norms"))
    )
    n = F.count(F.lit(1))
    fp = F.sum(
        ((F.col("flagged") == 1) & (F.col("is_dup") == 0)).cast("int")
    )
    return (
        flags.agg(
            n.cast("bigint").alias("n_docs"),
            F.sum("is_dup").cast("bigint").alias("n_true_dup"),
            F.sum("flagged").cast("bigint").alias("n_flagged"),
            fp.cast("bigint").alias("n_false_pos"),
            F.round(
                fp.cast("double") / (n - F.sum("is_dup")), 6
            ).alias("fp_rate"),
        )
        .crossJoin(F.broadcast(bits_n))
        .crossJoin(F.broadcast(norms_n))
        .select(
            "n_docs",
            "n_true_dup",
            "n_flagged",
            "n_false_pos",
            "fp_rate",
            F.col("n_bits").alias("n_bits_set"),
            F.round(
                F.col("n_bits") / F.lit(float(_BLOOM_M)), 6
            ).alias("fill_frac"),
            F.col("n_norms").alias("n_norms_audit"),
        )
    )


def run_streaming_kll_ingest(
    spark,
    docs_df: DataFrame,
    work_dir: str,
    n_slices: int = 3,
    timeout_sec: int = 180,
    cache_key: str | None = None,
) -> DataFrame:
    """KLL QUANTILE SKETCH AT INGEST — the thirteenth per-batch fold:
    the bounded survivor set (plus a 1-row meta table: items seen,
    accumulated error bound) rides as state while documents stream in
    doc_id-contiguous micro-batches; each batch enters at level 0 and
    the cascade re-runs for the CUMULATIVE population's active stages,
    lifting both the batch and any lower-level state rows to the
    current top level.  Compaction is fully deterministic (md5 groups
    and coins, the batch query's own salts), so a restarted drain
    reproduces the same sketch bit-for-bit — but a re-FOLDED batch
    would re-compact state it already entered, so the fold is
    SIDECAR-GUARDED: the applied-batch ledger commits with the state
    in one swap-generation rename and a redelivered batch_id is a
    no-op (pytested, like the other twelve folds).

    Unlike the commuting-partial folds, the drained sketch VALUES are a
    function of the batch boundaries (KLL merge order matters — this is
    inherent to compactor sketches, not an implementation artifact);
    what holds under ANY slicing is the deterministic rank-error BOUND,
    which the fold accumulates per compaction exactly as the theory
    charges it (sum over folds of 2^h * n_groups over that fold's
    active stages).  The drained report equals the generated per-slice
    DuckDB replay (_kll_fold_sql) bit-for-bit, and within_bound is
    pytested at 2, 3 and 5 slices.

    Slices are rank-deterministic (slice = ((rank_by_doc_id - 1) *
    n_slices) // N), not range-partitioner samples, so the oracle can
    reproduce the exact batch boundaries.  State is O(top buffer):
    survivors shrink geometrically above it.
    """
    import os
    import shutil

    from pyspark.sql import Window

    from newyork_taxi_etl_spark.queries.profiling import (
        _KLL_CAP,
        _kll_active_stages,
        _kll_coin_expr,
        _kll_grp_expr,
        _kll_report,
    )

    stage_dir = os.path.join(work_dir, "doc_stage")
    state_dir = os.path.join(work_dir, "kll_state")
    shutil.rmtree(state_dir, ignore_errors=True)

    d = docs_df.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(F.split("text", " ")).cast("bigint").alias("val"),
    )

    def build_stage(target: str) -> None:
        # rank-deterministic contiguous slices (the oracle replays the
        # same boundaries); the global ranking window runs once, at
        # staging time, over scaffolding only
        ranked = d.withColumn(
            "rnk", F.row_number().over(Window.orderBy("doc_id"))
        )
        total = ranked.count()
        sliced = ranked.withColumn(
            "sl",
            F.expr(f"CAST(((rnk - 1) * {n_slices}) DIV {total} AS INT)"),
        )
        os.makedirs(target, exist_ok=True)
        for i in range(n_slices):
            part = os.path.join(target, f"_part{i}")
            sliced.filter(F.col("sl") == i).select(
                "doc_id", "val"
            ).coalesce(1).write.mode("overwrite").parquet(part)
            src = next(
                f for f in os.listdir(part) if f.endswith(".parquet")
            )
            os.rename(
                os.path.join(part, src),
                os.path.join(target, f"slice-{i:04d}.parquet"),
            )
            shutil.rmtree(part, ignore_errors=True)
            t = 1_600_000_000 + (i + 1) * 10
            os.utime(
                os.path.join(target, f"slice-{i:04d}.parquet"), (t, t)
            )

    stage_dir = _stage_cached(
        stage_dir,
        cache_key and f"{cache_key}:kll_stage{n_slices}",
        build_stage,
    )

    stream = (
        spark.readStream.schema("doc_id bigint, val bigint")
        .format("parquet")
        .option("path", stage_dir)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def fold_batch(batch_df, batch_id):
        applied = _applied_batch_ids(state_dir)
        if int(batch_id) in applied:
            return  # redelivered batch: already folded (sidecar guard)
        ss = batch_df.sparkSession
        have = os.path.exists(os.path.join(state_dir, "meta"))
        if have:
            surv = ss.read.parquet(os.path.join(state_dir, "surv"))
            meta = ss.read.parquet(
                os.path.join(state_dir, "meta")
            ).collect()[0]
            n_prev, bound_acc = int(meta["n_seen"]), int(meta["bound_acc"])
        else:
            surv = local_rows_df(
                ss, [], "doc_id bigint, val bigint, lvl int"
            )
            n_prev, bound_acc = 0, 0
        batch = batch_df.select("doc_id", "val").withColumn(
            "lvl", F.lit(0)
        )
        n_batch = batch.count()
        n_cum = n_prev + n_batch
        cur = surv.unionByName(batch)
        # one-task tail collapse (r15, guide §2.4 — see
        # queries.profiling._kll_one_task_rows): the entering population
        # is the batch plus the BOUNDED state survivor set; once the
        # expected level-h population fits one task, the remaining
        # levels' windows run over SinglePartition with no per-level
        # hash exchange.  State is O(top buffer) by construction; the
        # 4*TOP*HMAX slack covers it at any slicing.
        from newyork_taxi_etl_spark.queries.profiling import (
            _KLL_HMAX,
            _KLL_TOP,
            _kll_one_task_rows,
        )

        one_task = _kll_one_task_rows()
        state_bound = 4 * _KLL_TOP * _KLL_HMAX
        collapsed = False
        for h in _kll_active_stages(n_cum):
            ng = -(-n_cum // ((1 << h) * _KLL_CAP))
            bound_acc += (1 << h) * ng
            if not collapsed and (n_batch >> h) + state_bound <= one_task:
                cur = cur.coalesce(1)
                collapsed = True
            # single pass per stage: non-level-h rows ride the sentinel
            # -1 group (bounded: they are higher-level survivors)
            cur = cur.withColumn(
                "grp",
                F.when(
                    F.col("lvl") == h, _kll_grp_expr(h, ng)
                ).otherwise(F.lit(-1)),
            )
            w = Window.partitionBy("grp").orderBy("val", "doc_id")
            cur = (
                cur.withColumn("pos", F.row_number().over(w))
                .filter(
                    (F.col("lvl") != h)
                    | (F.col("pos") % 2 == _kll_coin_expr(h))
                )
                .withColumn(
                    "lvl",
                    F.when(
                        F.col("lvl") == h, F.lit(h + 1)
                    ).otherwise(F.col("lvl")),
                )
                .select("doc_id", "val", "lvl")
            )
        nxt = state_dir + "_next"
        shutil.rmtree(nxt, ignore_errors=True)
        # state is top-buffer-sized: one file avoids 16-part dirs and
        # their re-list cost on every subsequent fold
        cur.coalesce(1).write.parquet(os.path.join(nxt, "surv"))
        local_rows_df(
            ss, [(n_cum, bound_acc)], "n_seen bigint, bound_acc bigint"
        ).coalesce(1).write.parquet(os.path.join(nxt, "meta"))
        _mark_applied(nxt, batch_id, applied)
        _swap_dir(nxt, state_dir)

    with _scoped_conf(spark, "spark.sql.shuffle.partitions", "16"):
        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, timeout_sec)

    surv = spark.read.parquet(os.path.join(state_dir, "surv")).select(
        "doc_id", "val"
    )
    meta = spark.read.parquet(os.path.join(state_dir, "meta")).collect()[0]
    n_final, bound_acc = int(meta["n_seen"]), int(meta["bound_acc"])
    h_final = len(_kll_active_stages(n_final))
    return _kll_report(
        spark,
        d,
        n_final,
        surv=surv,
        bound=2 * bound_acc + (1 << h_final),
    )
