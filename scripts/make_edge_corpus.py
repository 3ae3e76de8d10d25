"""Generate an adversarial edge corpus mirroring /root/testdata schemas.

The tables carry the inputs that historically diverge between Spark and
DuckDB: NULLs, ±inf, NaN, -0.0, int32-overflow magnitudes, malformed
JSON, unicode (multibyte / NBSP / zero-width), empty and whitespace-only
strings.  Usage:

    python scripts/make_edge_corpus.py /tmp/sf_edge
    DRIVE_SF=/tmp/sf_edge python scripts/drive_driver.py

Every oracle-checked key must still MATCH on this corpus — parity rules
that hold only on the well-behaved driver corpus are latent bugs (see
ADVICE.md round 1: q_percent_format's NULL branch).
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_edge"

rng = np.random.default_rng(47)

# events.value gets the full set: its cents paths use try_cast on both
# engines (non-finite -> NULL).  2^63-scale values are excluded — an
# int64-overflowing SUM has no engine-portable contract (Spark ANSI
# errors, DuckDB widens to HUGEINT); int32 overflow IS covered.
EDGE_DOUBLES = [
    None, float("inf"), float("-inf"), float("nan"), -0.0, 0.0,
    1e308, -1e308, 2**31 / 100 + 1, -(2**31) / 100 - 1,  # cents overflow int32
    99.996, 0.005, -0.005, 1e-15, 123.455, 42.0,
]
# Money columns (prices, balances, fees in TPC-H-shaped tables) are
# finite, exact-cents, and UNIQUE per table by ingest contract:
# - finite/scale-2: the decimal money-sum parity rule (plans/_sql.py)
#   presumes the column's true scale; a 3-decimal "price" manufactures
#   round-at-2 midpoints where the engines legitimately differ.
# - unique: argmax over a tied measure is nondeterministic in standard
#   SQL (both engines pick an arbitrary row) — ties are not a testable
#   contract.  NULLs and int32-overflowing cent counts stay.
EDGE_JSON = [
    None, "", "  ", "\t\n ", "{", "not json", "[]", "null", '{"k": null}', '{"k": "abc"}',
    '{"k": "3.7"}', '{"k": 3.7}', '{"k": 99999999999}', '{"k": -99999999999}',
    # duplicate keys excluded: RFC 8259 leaves them undefined and the
    # engines disagree (Spark/Jackson keeps last, DuckDB keeps first)
    '{"k": "007"}', '{"k": " 5 "}', '{"kk": 1}', '{"k": true}', '{"k": "éü"}',
]
EDGE_STRINGS = [
    None, "", " ", "  leading and trailing  ", "O'Brien, Jr. & Sons",
    "café über", "日本語テスト",
    "nbsp here", "zero​width", "tab\there", "UPPER lower MiXeD",
    "semi;colon,comma", "sl/ash\\back", "a" * 300, "-0.0", "123",
]


def strings(n, extra=()):
    pool = EDGE_STRINGS + list(extra)
    return [pool[i % len(pool)] for i in range(n)]


def doubles(n):
    return [EDGE_DOUBLES[i % len(EDGE_DOUBLES)] for i in range(n)]


def money(n):
    out = []
    for i in range(n):
        if i % 17 == 0:
            out.append(None)
        elif i % 23 == 5:
            out.append((2**31 + 137 * i) / 100.0)  # cents overflow int32
        else:
            out.append((i * 137 - 2000) / 100.0)  # unique, crosses zero
    return out


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


import os

os.makedirs(OUT, exist_ok=True)

N = 240  # small: the point is coverage of edge values, not volume

# events — ts is NANOS in the real corpus; preserve that (catalog.load
# special-cases nanos parquet).
ts_base = np.datetime64("2024-03-01T00:00:00", "ns")
ts = [
    None if i % 53 == 0 else ts_base + np.timedelta64(int(i * 7.3e11), "ns")
    for i in range(N)
]
ev_values = doubles(N)
ev_props = [EDGE_JSON[i % len(EDGE_JSON)] for i in range(N)]
# Pin the non-finite/overflow fee × VALID wizard steps interaction
# (r02 advice): without these rows every inf/NaN value lands on an
# invalid props.k and the currency formatter's isfinite/2^63 gate in
# q_engagement_pipeline is never exercised through the step gates.
# event_id 233: 233 % 3 != 0 → c = k = 50, s + c = 100 → valid steps;
# NaN fee must still reject ONLY via the fee gate's NaN ordering and
# format to '' if it ever reaches rendering. 234/235 likewise (234 % 3
# == 0 → c = 100 - 50 = 50, still valid).
for eid, bad in ((233, float("nan")), (234, float("inf")), (235, 1e308)):
    ev_values[eid] = bad
    ev_props[eid] = '{"k": 50}'
ev_ids = list(range(N))
ev_users = [i % 7 for i in range(N)]
ev_types = [["click", "view", "purchase", "submit", "", "signup"][i % 6] for i in range(N)]
# ADVICE r03 (q_conversion_latency): a user whose signup events ALL have
# NULL ts must still be emitted (signup_ts NULL, no qualifying purchase),
# and a user mixing NULL-ts and timed signups must take the timed MIN.
extra_rows = [
    # (event_id, ts, user_id, event_type)
    (N + 0, None, 900, "signup"),
    (N + 1, None, 900, "signup"),
    (N + 2, ts_base + np.timedelta64(10**13, "ns"), 900, "purchase"),
    (N + 3, None, 901, "signup"),
    (N + 4, ts_base + np.timedelta64(2 * 10**13, "ns"), 901, "signup"),
    (N + 5, ts_base + np.timedelta64(3 * 10**13, "ns"), 901, "purchase"),
]
for eid, ets, euid, etype in extra_rows:
    ev_ids.append(eid)
    ts.append(ets)
    ev_users.append(euid)
    ev_types.append(etype)
    ev_values.append(1.0)
    ev_props.append(None)
write(
    "events",
    pa.table(
        {
            "event_id": pa.array(ev_ids, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("ns")),
            "user_id": pa.array(ev_users, pa.int64()),
            "event_type": pa.array(ev_types),
            "value": pa.array(ev_values, pa.float64()),
            "props": pa.array(ev_props),
        }
    ),
)

# documents
write(
    "documents",
    pa.table(
        {
            "doc_id": pa.array(range(N), pa.int64()),
            "text": pa.array(
                strings(
                    N,
                    extra=[
                        "the quick brown fox jumps over the lazy dog " * 8,
                        "der schnelle braune fuchs springt " * 6,
                        "word " * 120,
                        # r03 stressors for BPE/chunking/unigram paths:
                        "x" * 3000,  # one giant token (no whitespace)
                        "a\u200bb\u200bc zero\u200bwidth joined",  # ZWSP is \S
                        "\u05e9\u05dc\u05d5\u05dd \u0639\u0627\u0644\u0645 rtl mix",  # Hebrew+Arabic
                        "12345 67890 " * 40,  # digit-run pieces
                        "!!!???;;;,,,... punct runs " * 15,
                    ],
                )
            ),
            "lang": pa.array([[None, "en", "de", "fr", ""][i % 5] for i in range(N)]),
            "source": pa.array([f"src{i % 3}" for i in range(N)]),
            "n_chars": pa.array(
                [None if i % 31 == 0 else (i * 37) % 5000 for i in range(N)],
                pa.int64(),
            ),
        }
    ),
)

# embeddings — include a zero vector (cosine-norm guard) but keep the
# REAL corpus dim (64: the LSH/IVF plane matrices are dim-typed) and
# values finite: vector distance on inf is undefined in both engines
# identically anyway.
dim = 64
embs = []
for i in range(N):
    if i % 29 == 0:
        embs.append([0.0] * dim)
    else:
        embs.append([float(x) for x in rng.normal(size=dim).astype(np.float32)])
write(
    "embeddings",
    pa.table(
        {
            "vec_id": pa.array(range(N), pa.int64()),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": pa.array([i % 5 for i in range(N)], pa.int32()),
        }
    ),
)

# TPC-H-ish dims and facts — smaller, with NULL/unicode/edge numerics.
NK = 30
write(
    "region",
    pa.table(
        {
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": pa.array(["AMERICA", "ASIA", None, "", "café"]),
        }
    ),
)
write(
    "nation",
    pa.table(
        {
            "n_nationkey": pa.array(range(NK), pa.int32()),
            "n_name": pa.array(strings(NK, extra=["BRAZIL", "CANADA"])),
            "n_regionkey": pa.array([i % 5 for i in range(NK)], pa.int32()),
        }
    ),
)
NC = 120
write(
    "customer",
    pa.table(
        {
            "c_custkey": pa.array(range(NC), pa.int64()),
            "c_name": pa.array(strings(NC, extra=["Customer#000000001"])),
            "c_nationkey": pa.array([i % NK for i in range(NC)], pa.int32()),
            "c_acctbal": pa.array(money(NC), pa.float64()),
            "c_mktsegment": pa.array(
                [["BUILDING", "MACHINERY", None, "", "AUTO MOBILE"][i % 5] for i in range(NC)]
            ),
        }
    ),
)
write(
    "supplier",
    pa.table(
        {
            "s_suppkey": pa.array(range(NC), pa.int64()),
            "s_name": pa.array(strings(NC)),
            "s_nationkey": pa.array([i % NK for i in range(NC)], pa.int32()),
            "s_acctbal": pa.array(money(NC), pa.float64()),
        }
    ),
)
NP = 100
write(
    "part",
    pa.table(
        {
            "p_partkey": pa.array(range(NP), pa.int64()),
            "p_name": pa.array(strings(NP)),
            "p_brand": pa.array([f"Brand#{i % 5}" for i in range(NP)]),
            "p_type": pa.array([["ECONOMY", "STANDARD", None, "", "PROMO"][i % 5] for i in range(NP)]),
            "p_size": pa.array([None if i % 17 == 0 else i % 50 for i in range(NP)], pa.int32()),
            "p_retailprice": pa.array(money(NP), pa.float64()),
        }
    ),
)
NO = 200
od_base = np.datetime64("1995-01-01T00:00:00", "ms")
write(
    "orders",
    pa.table(
        {
            "o_orderkey": pa.array(range(NO), pa.int64()),
            "o_custkey": pa.array([i % NC for i in range(NO)], pa.int64()),
            "o_orderstatus": pa.array([["O", "F", "P", None, ""][i % 5] for i in range(NO)]),
            "o_totalprice": pa.array(money(NO), pa.float64()),
            "o_orderdate": pa.array(
                [None if i % 41 == 0 else od_base + np.timedelta64(i * 86400000, "ms") for i in range(NO)],
                pa.timestamp("ms"),
            ),
            "o_orderpriority": pa.array(
                [["1-URGENT", "2-HIGH", "3-MEDIUM", None, ""][i % 5] for i in range(NO)]
            ),
        }
    ),
)
NL = 400
sd_base = np.datetime64("1995-02-01T00:00:00", "ms")
write(
    "lineitem",
    pa.table(
        {
            "l_orderkey": pa.array([i % NO for i in range(NL)], pa.int64()),
            "l_partkey": pa.array([i % NP for i in range(NL)], pa.int64()),
            "l_suppkey": pa.array([i % NC for i in range(NL)], pa.int64()),
            "l_linenumber": pa.array([i % 7 + 1 for i in range(NL)], pa.int32()),
            "l_quantity": pa.array([None if i % 23 == 0 else float(i % 50) for i in range(NL)], pa.float64()),
            "l_extendedprice": pa.array(money(NL), pa.float64()),
            "l_discount": pa.array(
                [None if i % 19 == 0 else (i % 11) / 100.0 for i in range(NL)], pa.float64()
            ),
            "l_tax": pa.array([(i % 9) / 100.0 for i in range(NL)], pa.float64()),
            "l_returnflag": pa.array([["A", "N", "R", None, ""][i % 5] for i in range(NL)]),
            "l_linestatus": pa.array([["O", "F"][i % 2] for i in range(NL)]),
            "l_shipdate": pa.array(
                [None if i % 37 == 0 else sd_base + np.timedelta64(i * 43200000, "ms") for i in range(NL)],
                pa.timestamp("ms"),
            ),
        }
    ),
)
print(f"edge corpus at {OUT}")
