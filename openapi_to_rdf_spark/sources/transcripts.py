"""Deterministic synthetic multi-turn transcript table.

Shape per BASELINE.json input_hint:
    (conv_id: string, turn_idx: int, role: string, text: string,
     tool: string, ts: timestamp)

Generation is 100% JVM-side (spark.range + xxhash64 + sequence/explode): no
Python in the data path, no driver-side loops, and the same (seed, n_convs)
always yields byte-identical rows at any parallelism — which is what lets the
N-vs-4N scaling benchmark run on identical input.

The text embeds schema-typed entity mentions with the generator grammar
``ClassName#key`` where:
- class tokens come from the converted 3GPP vocabulary (ManagedElement, ...);
- entity keys are Zipf-skewed (a few hot entities dominate — exercising the
  salted-join path, north_rule "skew handled explicitly");
- each logical entity surfaces under 3 alias spellings (``alpha-bravo-0042``,
  ``alpha_bravo_0042``, ``alpha.bravo.0042``) so MinHash-LSH canonicalization
  has real work with known ground truth (the numeric id suffix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CLASS_TOKENS = [
    "ManagedElement", "PerfMetricJob", "AlarmRecord", "ThresholdMonitor",
    "TraceJob", "MnsAgent", "SupportedPerfMetricGroup", "NtfSubscriptionControl",
]

ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "query_nrm", "fetch_alarms", "none"]

# BASELINE.json input_hint schema — the contract every transcript source
# (synthetic, external parquet, streaming) satisfies
TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")

HOT_ENTITIES = 5          # ids [0, HOT) receive ~30% of all mentions
ENTITY_POOL = 5000        # cold ids uniform in [HOT, ENTITY_POOL)
ALIAS_SEPS = ["-", "_", "."]

# entity surface = word[id%W] <sep> word[(id//W)%W] <sep> %04d — word pairs keep
# distinct entities' 3-gram Jaccard well under the 0.9 canonicalization
# threshold while alias spellings (separator variants) normalize to J=1.0
ENTITY_WORDS = [
    "alpha", "bravo", "cedar", "delta", "ember", "falcon", "gamma", "harbor",
    "indigo", "juno", "kappa", "lumen", "mesa", "nimbus", "onyx", "pylon",
    "quartz", "raven", "sigma", "topaz", "umber", "vertex", "willow", "zephyr",
]


def synth_transcripts(spark: SparkSession, n_convs: int, seed: int = 42,
                      partitions: int | None = None) -> DataFrame:
    """n_convs conversations x 2-8 turns each, deterministic in (n_convs, seed)."""
    parts = partitions or spark.sparkContext.defaultParallelism * 2
    base = spark.range(0, n_convs, 1, parts)

    h = lambda *cols: F.xxhash64(*cols, F.lit(seed))  # noqa: E731

    conv = base.select(
        F.format_string("c%09d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv_n"),
        (F.pmod(h(F.col("id")), F.lit(7)) + 2).cast("int").alias("n_turns"),
    )

    turns = conv.select(
        "conv_id", "conv_n",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    ht = h(F.col("conv_n"), F.col("turn_idx"))

    words = F.array(*[F.lit(w) for w in ENTITY_WORDS])
    n_words = len(ENTITY_WORDS)

    def entity_key(salt: str):
        """Zipf-ish skew + alias-variant spelling, all from hashes."""
        hh = h(F.col("conv_n"), F.col("turn_idx"), F.lit(salt))
        is_hot = F.pmod(hh, F.lit(10)) < 3
        ent_id = F.when(is_hot, F.pmod(hh, F.lit(HOT_ENTITIES))).otherwise(
            F.pmod(hh, F.lit(ENTITY_POOL - HOT_ENTITIES)) + HOT_ENTITIES).cast("int")
        sep = F.element_at(
            F.array(*[F.lit(s) for s in ALIAS_SEPS]),
            (F.pmod(h(F.col("conv_n"), F.col("turn_idx"), F.lit(salt + "v")),
                    F.lit(3)) + 1).cast("int"))
        w1 = F.element_at(words, F.pmod(ent_id, F.lit(n_words)) + 1)
        w2 = F.element_at(words,
                          (F.pmod(F.floor(ent_id / n_words), F.lit(n_words)) + 1).cast("int"))
        return F.concat(w1, sep, w2, sep, F.format_string("%04d", ent_id))

    cls = lambda salt: F.element_at(  # noqa: E731
        F.array(*[F.lit(c) for c in CLASS_TOKENS]),
        (F.pmod(h(F.col("conv_n"), F.col("turn_idx"), F.lit(salt)),
                F.lit(len(CLASS_TOKENS))) + 1).cast("int"))

    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]),
                        (F.pmod(F.col("turn_idx").cast("long"), F.lit(3)) + 1).cast("int"))

    n_mentions = F.pmod(ht, F.lit(3))  # 0..2 mentions per turn

    mention1 = F.concat(cls("c1"), F.lit("#"), entity_key("e1"))
    mention2 = F.concat(cls("c2"), F.lit("#"), entity_key("e2"))

    text = F.concat(
        F.lit("turn "), F.col("turn_idx").cast("string"),
        F.lit(" of conversation "), F.col("conv_id"),
        F.when(n_mentions >= 1, F.concat(F.lit(" discussing "), mention1)).otherwise(F.lit("")),
        F.when(n_mentions >= 2, F.concat(F.lit(" linked to "), mention2)).otherwise(F.lit("")),
        F.lit(" value="), F.pmod(ht, F.lit(1000)).cast("string"),
    )

    tool = F.when(
        role == "tool",
        F.element_at(F.array(*[F.lit(t) for t in TOOLS]),
                     (F.pmod(ht, F.lit(len(TOOLS))) + 1).cast("int"))
    ).otherwise(F.lit(None).cast("string"))

    ts = F.timestamp_seconds(
        F.lit(1767225600)  # 2026-01-01T00:00:00Z
        + F.pmod(F.col("conv_n"), F.lit(86400 * 30)) * 60
        + F.col("turn_idx") * 7)

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def read_transcript_table(spark: SparkSession, path: str,
                          fmt: str = "parquet") -> DataFrame:
    """External transcript table -> the input_hint contract, any format.

    Reads parquet / csv / json with the EXPLICIT transcript schema (never
    inferSchema — a schema-inference pass over 100 TB is a full extra scan,
    and inference can silently type turn_idx as string on dirty data),
    casts/projects to the canonical column set, and enforces the
    (conv_id, turn_idx) uniqueness precondition the pipeline's set
    semantics rely on (see plans.pipeline / remap_triples)."""
    reader = spark.read.schema(TRANSCRIPT_SCHEMA)
    if fmt == "csv":
        reader = reader.option("header", "true").option("timestampFormat",
                                                        "yyyy-MM-dd'T'HH:mm:ssXXX")
    df = reader.format(fmt).load(path)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return df.select(*cols).dropDuplicates(["conv_id", "turn_idx"])


def entity_registry_df(spark: SparkSession,
                       n_entities: int = ENTITY_POOL) -> DataFrame:
    """Authority registry for entity-link scoring (operators/linker):
    one row per logical entity with its CANONICAL ("-"-separated) spelling
    as the name — the generator's other alias spellings ("_", ".") must
    link here. prior = 1.0 for hot entities, 0.0 cold (hot entities are
    likelier link targets, mirroring their mention mass). 100% JVM-side
    (spark.range), deterministic, any parallelism."""
    words = F.array(*[F.lit(w) for w in ENTITY_WORDS])
    n_words = len(ENTITY_WORDS)
    ent_id = F.col("id").cast("int")
    w1 = F.element_at(words, F.pmod(ent_id, F.lit(n_words)) + 1)
    w2 = F.element_at(words,
                      (F.pmod(F.floor(ent_id / n_words), F.lit(n_words)) + 1).cast("int"))
    return spark.range(n_entities).select(
        F.col("id").alias("entity_id"),
        F.concat(w1, F.lit("-"), w2, F.lit("-"),
                 F.format_string("%04d", ent_id)).alias("name"),
        F.lit(None).cast("string").alias("class_name"),
        F.when(ent_id < HOT_ENTITIES, 1.0).otherwise(0.0).alias("prior"))


def class_vocab_df(spark: SparkSession, class_iris: list[str] | None = None) -> DataFrame:
    """Class-token -> class-IRI dictionary (broadcast dim for typed emission).

    Defaults to the generator's tokens mapped into the kg namespace; the
    production path feeds rdfs:Class IRIs from the converted vocabulary
    (extract.convert_specs_df output filtered to p=rdf:type, o=rdfs:Class).
    """
    rows = [(c, f"http://ericsson.com/models/3gpp/kg#{c}") for c in CLASS_TOKENS] \
        if class_iris is None else [(i.rsplit("#", 1)[-1], i) for i in class_iris]
    return spark.createDataFrame(rows, ["class_name", "class_iri"])


def synth_tool_results(turns: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministic tool-RESULT event stream derived from the tool turns
    of ``turns``: one result per invocation, arriving 1-80s later (so a
    60s join bound leaves a deterministic ~25% unmatched — the interval
    join's negative path is data, not a mock), status 'error' for ~1/5.
    Columns: (conv_id, tool, result_id, status, ts)."""
    t = turns.filter(F.col("tool").isNotNull())
    h = F.xxhash64("conv_id", "turn_idx", F.lit(seed))
    delay = (F.pmod(h, F.lit(80)) + 1).cast("int")
    return t.select(
        "conv_id", "tool",
        F.concat(F.lit("res-"), F.col("conv_id"), F.lit("-"),
                 F.col("turn_idx").cast("string")).alias("result_id"),
        F.when(F.pmod(h, F.lit(5)) == 0, F.lit("error"))
        .otherwise(F.lit("ok")).alias("status"),
        (F.col("ts") + F.make_interval(secs=delay)).alias("ts"))
