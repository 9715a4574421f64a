"""Privacy / PII-scrubbing pack (round 4, late widening).

The LLM-training-data angle the surface still lacked: before any corpus
ships to a trainer, a pipeline must FIND personally identifiable
information, REDACT it, and prove the released aggregates satisfy formal
anonymity models. Four oracled queries:

  q_pii_detect    regex PII census (IP / email / SSN shapes) per event class
  q_pii_redact    typed-placeholder redaction with a per-row removal count
  q_pii_luhn      Luhn-checksum validation of card-number shapes (the
                  standard "is this 16-digit run actually a PAN" filter),
                  all-integer arithmetic
  q_ldiversity    l-diversity census over the released quasi-identifier
                  groups — the companion to q_kanonymize (curation.py):
                  k bounds group SIZE, l bounds the DIVERSITY of the
                  sensitive attribute within each group

Heritage: the reference (main.py:287-309) exports raw collections with no
scrubbing; these queries are the curation layer its consumers would need
before reusing the export as training data.

The fixtures carry no real PII, so the detect/redact/luhn queries first
BUILD deterministic PII-shaped strings from fixture integers (same
expression tree on both engines — the md5-twin discipline from SURVEY
§2.4 applied to string synthesis), then run the actual detection /
redaction / checksum machinery on them. What is under test is the
machinery; the synthesis is just a portable fixture.

Cross-engine notes: digit folds are statically expanded integer sums
(one builder emits both dialects — see the Luhn section). Regexes stay
in the RE2-and-Java-common subset (character classes, bounded repeats;
no lookaround, no \\d shorthands since RE2/Java agree but DuckDB string
literals keep backslashes literal — spelled [0-9] instead).

Scale: every query here is a single scan with map-side-only work
(regexp / fold / lpad are all codegen'd, no Python), except the two
census aggregations which shuffle one partial row per (group,
partition). The shape that streams 100 TB at IO speed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_to_parquet_spark.sources.catalog import load_table as T
from mongo_to_parquet_spark.queries._registry import make_registry

QUERIES, ORACLE, q = make_registry()


# --------------------------------------------------------- PII synthesis ---
# One definition per engine dialect, kept textually parallel so a reviewer
# can diff them. The msg embeds PII-shaped spans conditionally so the
# detector's flags actually vary: an RFC1918 IP every 3rd event, an email
# every 4th, an SSN shape every 5th.

_MSG_SPARK = (
    "concat('uid=', CAST(user_id AS STRING), "
    " CASE WHEN event_id % 3 = 0 THEN concat(' ip=10.', CAST(user_id % 256 AS STRING),"
    "      '.', CAST(event_id % 256 AS STRING), '.', CAST((event_id div 7) % 256 AS STRING))"
    "      ELSE '' END, "
    " CASE WHEN event_id % 4 = 0 THEN concat(' mail=u', CAST(user_id AS STRING), '@example.com')"
    "      ELSE '' END, "
    " CASE WHEN event_id % 5 = 0 THEN concat(' ssn=', lpad(CAST((user_id * 37) % 1000 AS STRING), 3, '0'),"
    "      '-', lpad(CAST(event_id % 100 AS STRING), 2, '0'),"
    "      '-', lpad(CAST((event_id * 13) % 10000 AS STRING), 4, '0'))"
    "      ELSE '' END)"
)

_MSG_DUCK = (
    "concat('uid=', CAST(user_id AS VARCHAR), "
    " CASE WHEN event_id % 3 = 0 THEN concat(' ip=10.', CAST(user_id % 256 AS VARCHAR),"
    "      '.', CAST(event_id % 256 AS VARCHAR), '.', CAST((event_id // 7) % 256 AS VARCHAR))"
    "      ELSE '' END, "
    " CASE WHEN event_id % 4 = 0 THEN concat(' mail=u', CAST(user_id AS VARCHAR), '@example.com')"
    "      ELSE '' END, "
    " CASE WHEN event_id % 5 = 0 THEN concat(' ssn=', lpad(CAST((user_id * 37) % 1000 AS VARCHAR), 3, '0'),"
    "      '-', lpad(CAST(event_id % 100 AS VARCHAR), 2, '0'),"
    "      '-', lpad(CAST((event_id * 13) % 10000 AS VARCHAR), 4, '0'))"
    "      ELSE '' END)"
)

_RE_IP = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
_RE_EMAIL = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_RE_SSN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"


# ------------------------------------------------------------ detection ---
@q(
    "q_pii_detect",
    f"""
    WITH m AS (SELECT event_type, {_MSG_DUCK} AS msg FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_msgs,
           CAST(SUM(CASE WHEN regexp_matches(msg, '{_RE_IP}') THEN 1 ELSE 0 END) AS BIGINT) AS n_ip,
           CAST(SUM(CASE WHEN regexp_matches(msg, '{_RE_EMAIL}') THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
           CAST(SUM(CASE WHEN regexp_matches(msg, '{_RE_SSN}') THEN 1 ELSE 0 END) AS BIGINT) AS n_ssn,
           CAST(SUM(len(regexp_extract_all(msg, '[0-9]+'))) AS BIGINT) AS n_digit_runs
    FROM m GROUP BY event_type ORDER BY event_type
    """,
)
def q_pii_detect(spark, sf):
    # PII census before release: per event class, how many messages carry
    # each PII shape, plus total digit-run volume (the "how much residual
    # numeric material" signal reviewers sort by).
    #
    # Scale: one scan; regexp flags are codegen'd JVM work, the groupBy
    # shuffles one partial per (event_type, partition) — map-side combine
    # carries the whole 100 TB load.
    e = T(spark, sf, "events")
    msg = F.expr(_MSG_SPARK)
    flag = lambda pat: F.when(msg.rlike(pat), 1).otherwise(0)  # noqa: E731
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_msgs"),
            F.sum(flag(_RE_IP)).cast("bigint").alias("n_ip"),
            F.sum(flag(_RE_EMAIL)).cast("bigint").alias("n_email"),
            F.sum(flag(_RE_SSN)).cast("bigint").alias("n_ssn"),
            F.sum(F.size(F.regexp_extract_all(msg, F.lit("[0-9]+"), F.lit(0))))
            .cast("bigint")
            .alias("n_digit_runs"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------------------ redaction ---
@q(
    "q_pii_redact",
    f"""
    WITH m AS (
        SELECT event_id, {_MSG_DUCK} AS msg FROM events WHERE user_id % 10 = 0
    )
    SELECT event_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(msg, '{_RE_SSN}', '<SSN>', 'g'),
               '{_RE_IP}', '<IP>', 'g'),
             '{_RE_EMAIL}', '<EMAIL>', 'g') AS redacted,
           CAST(len(regexp_extract_all(msg, '{_RE_SSN}'))
              + len(regexp_extract_all(msg, '{_RE_IP}'))
              + len(regexp_extract_all(msg, '{_RE_EMAIL}')) AS INT) AS n_pii
    FROM m
    """,
)
def q_pii_redact(spark, sf):
    # typed-placeholder redaction: SSN first (most specific), then IP,
    # then email — replacement ORDER is part of the contract (an IP
    # replaced first would otherwise split an SSN-adjacent digit run).
    # n_pii counts spans found BEFORE redaction so the audit trail
    # records removal volume per row.
    #
    # Scale: pure map-side (filter + regexp_replace chain, all codegen);
    # zero shuffles — redaction of 100 TB is IO-bound by construction.
    e = T(spark, sf, "events").filter(F.col("user_id") % 10 == 0)
    msg = F.expr(_MSG_SPARK)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(msg, _RE_SSN, "<SSN>"), _RE_IP, "<IP>"
        ),
        _RE_EMAIL,
        "<EMAIL>",
    )
    n = lambda pat: F.size(F.regexp_extract_all(msg, F.lit(pat), F.lit(0)))  # noqa: E731
    return e.select(
        "event_id",
        red.alias("redacted"),
        (n(_RE_SSN) + n(_RE_IP) + n(_RE_EMAIL)).cast("int").alias("n_pii"),
    )


# ---------------------------------------------------------------- Luhn ----
# Luhn checksum over a synthesized 16-digit PAN: base-15 digits from
# o_orderkey (lpad'd key || multiplicative-hash tail), check digit
# computed by the standard mod-10 double-every-other fold, then ~1/7 of
# the PANs are corrupted one digit so the validator has both classes to
# find. In the final even-length PAN, doubling applies at EVEN 1-based
# positions from the RIGHT (the check digit, rightmost, is undoubled);
# for the 15-digit base that is ODD positions from the right.
#
# The digit folds are STATIC ARITHMETIC SUMS over CAST(digits AS BIGINT)
# — (p div 10^i) % 10 terms expanded at build time — not lambda folds:
# Spark's `aggregate`/`transform` HigherOrderFunctions are interpreted
# (codegen fallback, one closure eval per element), and replacing them
# with the expanded expression measured 1.65s -> 0.76s at sf0.1 warm.
# A 16-digit string fits int64 (10^16 < 2^63), so the validator casts
# the pan it is GIVEN — semantics unchanged, still validates arbitrary
# digit strings. One expression builder emits both dialects (only the
# floor-div token differs), so the trees cannot diverge.


def _luhn_sum(var: str, n_digits: int, double_odd_from_right: bool, divop: str) -> str:
    terms = []
    for r in range(1, n_digits + 1):  # r = 1-based position from the right
        d = f"(({var} {divop} {10 ** (r - 1)}) % 10)"
        if (r % 2 == 1) == double_odd_from_right:
            terms.append(f"CASE WHEN 2 * {d} > 9 THEN 2 * {d} - 9 ELSE 2 * {d} END")
        else:
            terms.append(d)
    return "(" + " + ".join(terms) + ")"


# base15: doubling at odd-from-right (base digit at base-right position
# rb sits at final right position rb+1, doubled when rb+1 is even)
_LUHN15_DUCK = _luhn_sum("CAST(base15 AS BIGINT)", 15, True, "//")
_LUHN16_DUCK = _luhn_sum("CAST(pan AS BIGINT)", 16, False, "//")
_LUHN15_SPARK = _luhn_sum("CAST(base15 AS BIGINT)", 15, True, "div")
_LUHN16_SPARK = _luhn_sum("CAST(pan AS BIGINT)", 16, False, "div")


@q(
    "q_pii_luhn",
    f"""
    WITH b AS (
        SELECT o_orderkey,
               concat(lpad(CAST(o_orderkey % 10000000 AS VARCHAR), 7, '0'),
                      lpad(CAST(((o_orderkey % 100000000) * 2654435761) % 100000000 AS VARCHAR), 8, '0'))
                   AS base15
        FROM orders
    ),
    s AS (SELECT o_orderkey, base15, {_LUHN15_DUCK} AS s15 FROM b),
    p0 AS (
        SELECT o_orderkey,
               concat(base15, CAST((10 - s15 % 10) % 10 AS VARCHAR)) AS pan0
        FROM s
    ),
    pc AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0
                    THEN concat(substr(pan0, 1, 7),
                                CAST((CAST(substr(pan0, 8, 1) AS INT) + 1) % 10 AS VARCHAR),
                                substr(pan0, 9))
                    ELSE pan0 END AS pan
        FROM p0
    )
    SELECT o_orderkey, pan, ({_LUHN16_DUCK} % 10 = 0) AS is_valid FROM pc
    """,
)
def q_pii_luhn(spark, sf):
    # card-shape validation: a 16-digit run is only treated as a PAN when
    # its Luhn checksum holds — the filter that separates card numbers
    # from order ids / phone digits in a PII sweep. The corrupted ~1/7
    # (single mid-digit bump, undoubled position, so the sum moves by
    # +1 or -9 — never 0 mod 10) must all come back is_valid = false.
    #
    # Scale: pure map-side integer arithmetic, fully inside whole-stage
    # codegen (static expanded sums, no interpreted lambda), no shuffle.
    o = T(spark, sf, "orders")
    # key reduced mod 10^7/10^8 BEFORE the multiplicative hash: the raw
    # product overflows int64 for keys >= ~3.5e9, where DuckDB (errors)
    # and Spark non-ANSI (wraps) diverge — bound it so both engines stay
    # in exact range at any SF (self-review lesson: overflow divergence,
    # not overflow itself, is the cross-engine hazard)
    b = o.select(
        "o_orderkey",
        F.concat(
            F.lpad((F.col("o_orderkey") % 10000000).cast("string"), 7, "0"),
            F.lpad(
                (((F.col("o_orderkey") % 100000000) * F.lit(2654435761)) % 100000000).cast("string"),
                8,
                "0",
            ),
        ).alias("base15"),
    )
    s = b.withColumn("s15", F.expr(_LUHN15_SPARK))
    p0 = s.select(
        "o_orderkey",
        F.concat(
            "base15", ((10 - F.col("s15") % 10) % 10).cast("string")
        ).alias("pan0"),
    )
    pc = p0.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.concat(
                F.substring("pan0", 1, 7),
                ((F.substring("pan0", 8, 1).cast("int") + 1) % 10).cast("string"),
                F.expr("substring(pan0, 9)"),
            ),
        )
        .otherwise(F.col("pan0"))
        .alias("pan"),
    )
    return pc.select(
        "o_orderkey", "pan", (F.expr(_LUHN16_SPARK) % 10 == 0).alias("is_valid")
    )


# ---------------------------------------------------------- l-diversity ---
@q(
    "q_ldiversity",
    """
    SELECT CAST(c_nationkey AS INT) AS nat,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l,
           (COUNT(DISTINCT c_mktsegment) >= 3) AS diverse,
           ROUND(CAST(COUNT(DISTINCT c_mktsegment) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS diversity_ratio
    FROM customer GROUP BY 1 ORDER BY 1
    """,
)
def q_ldiversity(spark, sf):
    # l-diversity audit of the release in q_kanonymize's pipeline: for
    # each quasi-identifier group (nation), the sensitive attribute
    # (market segment) must take >= l distinct values, else membership in
    # the group reveals the sensitive value (the homogeneity attack that
    # k-anonymity alone does not stop). Distinct-count per group is exact.
    #
    # Scale: groupBy + count(distinct) expands to the standard two-phase
    # Expand/partial-agg plan — one shuffle keyed on (nat, segment)
    # partials, never row-level data. 25 output rows at any SF.
    c = T(spark, sf, "customer")
    ldist = F.countDistinct("c_mktsegment")
    return (
        c.groupBy(F.col("c_nationkey").cast("int").alias("nat"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            ldist.cast("bigint").alias("l"),
            (ldist >= 3).alias("diverse"),
            F.round(ldist / F.count(F.lit(1)), 4).alias("diversity_ratio"),
        )
        .orderBy("nat")
    )
