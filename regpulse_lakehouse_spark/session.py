"""SparkSession factory tuned for both local testing and cluster scale.

Local runs use ``local[$SPARK_GRAFT_CPUS]``; the conf below is chosen so
the same code is correct on a 1000-executor cluster:

- AQE on (runtime coalescing, skew-join splitting) so shuffle
  partition counts self-tune at any scale factor;
- shuffle partitions default to the local core count (overridable via
  ``SPARK_GRAFT_SHUFFLE_PARTITIONS``) — at cluster scale AQE coalesces
  from a high initial number instead;
- Arrow enabled for every pandas interchange (Pandas UDFs,
  ``applyInPandas``) — the only Python-side stages are the pluggable
  model operators;
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os
import re
import weakref

from pyspark.sql import SparkSession

from . import tmpstate

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Coalesce by target partition SIZE, not down-to-parallelism-only:
    # with the default (true), AQE keeps ≥defaultParallelism partitions,
    # so a 100-row shuffle still runs 32 tasks — each Pandas-UDF task
    # then pays Python-worker + Arrow setup for a handful of rows. Size-
    # first is also what the Spark docs recommend for production.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    # Keep parquet scans wide enough to parallelize at sf0.1 locally and
    # naturally split at 100 TB (default 128m per split).
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.ui.enabled": "false",
    # Generated wholestage classes are cached by SOURCE TEXT; the default
    # per-query codegenStageId baked into the class name makes every AQE
    # stage re-plan (and every query sharing a subplan) a guaranteed cache
    # miss → janino recompile + fresh JIT. Stable names turn those into
    # cache hits: measured 30 → 0 recompiles on the second run of the
    # MinHash-LSH plan. Costs only debuggability of stack traces.
    "spark.sql.codegen.useIdInClassName": "false",
    # ...and give the compiled-class cache room for the 50-row registry:
    # the default 100 entries can thrash once a bench pass cycles ~50
    # queries × several wholestage spans each. r12 observed the
    # regex-heavy rows (v1_v2, f2_f9) bimodal 0.3 s vs 4-5 s warm;
    # post-bench box load was also implicated, but a Janino recompile of
    # an evicted giant regex span costs exactly that shape, and a 10×
    # cache of compiled classes is a few MB — cheap insurance either way.
    "spark.sql.codegen.cache.maxEntries": "1000",
    # No [Stage N:===>] console spam: harness/driver output captures must
    # carry the bench JSON line intact, not megabytes of progress frames.
    "spark.ui.showConsoleProgress": "false",
    # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
    # rejects; read as long and convert in sources/tpch.py (ts div 1000).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    # saveAsTable (bucketed layouts, sources/layout.py) must not drop a
    # spark-warehouse/ directory into the repo working tree. Per-process
    # path: a SHARED dir permanently bricks managed tables after any
    # aborted run (the new session's in-memory catalog has no entry for
    # the leftover directory, so overwrite hits "location already
    # exists" and DROP TABLE is a no-op) and collides across concurrent
    # runs.
    "spark.sql.warehouse.dir": os.environ.get(
        "SPARK_GRAFT_WAREHOUSE", f"file:///tmp/spark_graft_warehouse_{os.getpid()}"
    ),
}


def _initial_heap(mem: str) -> str | None:
    """-Xms sized to half of -Xmx, capped at 16g: Spark only sets -Xmx,
    so the JVM otherwise starts at a ~1g heap and grows it through
    dozens of stop-the-world GCs mid-workload — measured as multi-second
    jitter spikes on the string-churning dedup queries. Only whole-GiB
    driver-memory strings are handled; anything else keeps JVM defaults."""
    m = re.fullmatch(r"(\d+)[gG]", mem.strip())
    if not m:
        return None
    xms = max(1, min(16, int(m.group(1)) // 2))
    # PreTouch faults the pages in at JVM start (once, before any query
    # is timed) instead of spreading page faults over the first heavy
    # workloads.
    return f"-Xms{xms}g -XX:+AlwaysPreTouch"


def get_spark(app_name: str = "regpulse_lakehouse_spark") -> SparkSession:
    """Build (or reuse) the tuned SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
    )
    xms = _initial_heap(_DEFAULTS["spark.driver.memory"])
    if xms:
        builder = builder.config("spark.driver.extraJavaOptions", xms)
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: Per-parent memo of ``newSession()`` clones, keyed by a caller tag
#: (typically "purpose:abspath(sf_dir)"). The graded rows that need an
#: isolated SQLConf (shingle shuffle sizing, PageRank loop width, the
#: 4-partition streaming state stores) previously built a FRESH clone
#: per call — ~80 ms of py4j/SessionState setup plus a re-tune of the
#: conf on every bench invocation. A clone is only a conf holder: no
#: data, no results, no file listings live on it, so reuse is purely
#: plan-metadata reuse. Weak-keyed by the parent session; cleared with
#: the other py4j-holding caches on tmpstate.cleanup().
_SCOPED_SESSIONS: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)

tmpstate.on_cleanup(_SCOPED_SESSIONS.clear)


def scoped_session(
    parent: SparkSession,
    tag: str,
    fingerprint: object = None,
    setup=None,
) -> SparkSession:
    """Memoized ``parent.newSession()`` clone for ``tag``, re-tuned by
    ``setup(clone)`` whenever the clone is first built OR ``fingerprint``
    differs from the one the last successful setup ran under.

    ``fingerprint`` must capture everything the setup's conf values are
    derived from — typically the input file's stat key plus the sizing
    constant and the ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` pin. r15 keyed the
    memo on the tag alone, so a regenerated input at the same path kept a
    stale ``spark.sql.shuffle.partitions`` for the life of the process
    (VERDICT r15 item 1) — the staleness class ``load_table``'s stat key
    was built to prevent. The memo entry is committed only AFTER setup
    succeeds (ADVICE r15): a setup that raises on first call leaves no
    half-tuned clone behind, and the next call retries it."""
    per = _SCOPED_SESSIONS.setdefault(parent, {})
    entry = per.get(tag)
    if entry is not None and entry[1] == fingerprint:
        return entry[0]
    s = entry[0] if entry is not None else parent.newSession()
    if setup is not None:
        setup(s)
    per[tag] = (s, fingerprint)
    return s


def stat_fingerprint(path: str) -> tuple | None:
    """(abspath, mtime_ns, size) of ``path`` — the same staleness key
    ``load_table`` uses for its frame memo; None when the path cannot be
    stat'd (the caller's real read will raise the proper error). For a
    DIRECTORY of part files an in-place rewrite need not touch the dir
    stat, so fold in a child-file summary (ADVICE r15)."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    if os.path.isdir(path):
        total = n = newest = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    cst = os.stat(os.path.join(root, f))
                except OSError:
                    continue
                n += 1
                total += cst.st_size
                newest = max(newest, cst.st_mtime_ns)
        key += (n, total, newest)
    return key


def input_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` through the Hadoop FileSystem API —
    storage-agnostic (local, HDFS, object stores), one metadata call,
    no data read."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(hpath).getLength())


def tune_shuffle_for_input(
    spark: SparkSession,
    path: str,
    bytes_per_partition: int,
    cap: int = 4096,
    floor: int | None = None,
) -> int:
    """Set ``spark.sql.shuffle.partitions`` from the INPUT size so
    shuffle-heavy operators self-size at any scale factor instead of
    inheriting the local core count (VERDICT r8 task 4: sf10
    `dd_ngram_jaccard` at the fixed local 32 partitions ran 52-133 s;
    at 256 it ran 36-48 s with identical output — a config artifact,
    not a plan defect, but one a user should never have to fix by env
    var).

    partitions = clamp(input_bytes / bytes_per_partition,
                       defaultParallelism, cap)

    ``bytes_per_partition`` is calibrated PER OPERATOR FAMILY to the
    ratio of its shuffle volume to its (compressed, columnar) input
    bytes — e.g. shingle explodes blow 1 byte of snappy'd parquet text
    into hundreds of shuffle bytes. Growing the number only raises the
    INITIAL partition count: AQE coalesce (parallelismFirst=false)
    remains the shrink path, so over-estimating costs little, while
    under-estimating serializes fat partitions. An explicit
    ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` env var wins — never override a
    user's pinned choice. Returns the partition count in effect."""
    pinned = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if pinned:
        # Apply the pin to THIS session too: get_spark() set it at
        # build time, but callers may hand in vanilla sessions (see
        # tpch.py) — returning a count that is not actually in effect
        # would mis-report. Also validates the env var on every path.
        n = int(pinned)
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        return n
    # default floor = core count (never serialize a wide scan); an
    # explicit lower floor is for ITERATIVE loops over modest state,
    # where per-round task-scheduling overhead beats extra parallelism
    # (measured on gr_pagerank_topk: 32 partitions 8.5 s warm, 16 →
    # 6.8 s at sf0.1 — same plan, fewer tiny tasks per round)
    if floor is None:
        floor = spark.sparkContext.defaultParallelism
    n = max(floor, min(cap, -(-input_bytes(spark, path) // bytes_per_partition)))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return n
