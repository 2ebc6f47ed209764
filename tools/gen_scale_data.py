#!/usr/bin/env python
"""One-off sf1 (10x sf0.1) generator for the empirical scale check.

VERDICT r9 #4: every 100 TB claim in docs/SCALE.md is analytic
(plan-shape tests + docstrings); this tool provides the one missing
empirical leg — a 10x dataset so the most expensive operators can be
timed at sf0.1 vs sf1 and their measured scaling exponents recorded.

The driver owns /root/testdata (read-only); this generator FITS the
sf0.1 empirical distributions and re-samples them at 10x, mimicking
the observed structure rather than copying rows (copying would make
every doc a 10-way exact duplicate and distort exactly the dedup
operators the check is about):

- documents: 31-word vocabulary with near-uniform empirical unigram
  frequencies; doc length ~ Uniform[10, 100] words; lang/source from
  the empirical multinomials (en-skewed langs, 20 uniform sources);
  ~5% of docs are word-substitution mutations of an earlier doc
  (sf0.1 shows 477/5000 docs in shared-prefix near-dup groups, max
  group 4) and ~0.16% are exact copies.
- embeddings: 10 Gaussian label clusters re-fit from sf0.1
  (per-label mean vector + per-dimension std), 64-dim float32.

Deterministic (numpy PCG, seed 42). Output is gitignored scratch —
correctness never reads it; only tools/scale_check.py does.

Usage: python tools/gen_scale_data.py [--mult 10] [--out _scale/sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"


def fit_documents(path: str):
    t = pq.read_table(os.path.join(path, "documents.parquet"))
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    from collections import Counter

    words = Counter()
    for s in texts:
        words.update(s.split(" "))
    vocab = sorted(words)
    wp = np.array([words[w] for w in vocab], dtype=float)
    lang_c = Counter(langs)
    lv = sorted(lang_c)
    lp = np.array([lang_c[v] for v in lv], dtype=float)
    src_c = Counter(sources)
    sv = sorted(src_c)
    sp = np.array([src_c[v] for v in sv], dtype=float)
    lens = [len(s.split(" ")) for s in texts]
    return {
        "vocab": vocab, "wp": wp / wp.sum(),
        "langs": lv, "lp": lp / lp.sum(),
        "sources": sv, "sp": sp / sp.sum(),
        "len_lo": min(lens), "len_hi": max(lens),
        "n": len(texts),
    }


def gen_documents(fitted: dict, n: int, rng: np.random.Generator,
                  p_mutcopy: float = 0.05, p_exact: float = 0.0016,
                  p_sub: float = 0.08):
    vocab = np.array(fitted["vocab"])
    texts: list[str] = []
    out_lang = rng.choice(fitted["langs"], size=n, p=fitted["lp"])
    out_src = rng.choice(fitted["sources"], size=n, p=fitted["sp"])
    kinds = rng.random(n)
    for i in range(n):
        if i > 0 and kinds[i] < p_exact:
            texts.append(texts[rng.integers(0, i)])
        elif i > 0 and kinds[i] < p_exact + p_mutcopy:
            w = texts[rng.integers(0, i)].split(" ")
            sub = rng.random(len(w)) < p_sub
            repl = rng.choice(vocab, size=int(sub.sum()), p=fitted["wp"])
            j = 0
            for k in np.flatnonzero(sub):
                w[k] = repl[j]
                j += 1
            texts.append(" ".join(w))
        else:
            ln = int(rng.integers(fitted["len_lo"], fitted["len_hi"] + 1))
            texts.append(" ".join(rng.choice(vocab, size=ln, p=fitted["wp"])))
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(out_lang, pa.string()),
        "source": pa.array(out_src, pa.string()),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })


def gen_embeddings(path: str, n: int, rng: np.random.Generator):
    t = pq.read_table(os.path.join(path, "embeddings.parquet"))
    lab = np.asarray(t.column("label").to_pylist())
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.sort(np.unique(lab))
    out_lab = rng.choice(labels, size=n)
    dim = mat.shape[1]
    vecs = np.empty((n, dim), dtype=np.float32)
    for v in labels:
        mask = out_lab == v
        mu = mat[lab == v].mean(axis=0)
        sd = mat[lab == v].std(axis=0)
        vecs[mask] = rng.normal(mu, sd, size=(int(mask.sum()), dim)).astype(
            np.float32
        )
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v for v in vecs.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(out_lab.astype(np.int32), pa.int32()),
    })


def gen_events_adversarial(n: int, rng: np.random.Generator):
    """ADVERSARIAL events stream for the r11 window-boundedness check
    (VERDICT r10 "What's wrong" #3): per-type inter-arrival gaps drawn
    lognormal(mu=8, sigma=3) ms — spanning ~1 ms to ~1e7 ms, so at 1M
    rows the ms-resolution gaps are nearly ALL DISTINCT (the case that
    defeated the r10 DISTINCT-(type, gap) collapse) — and zipf(1.6)
    user_ids, so the per-user count histogram has a long diverse tail
    (the analogous stress for ev_user_concentration's count-level
    window).  Matches the /root/testdata events.parquet schema
    (timestamp[us] ts)."""
    types = np.array(["signup", "click", "error", "view", "purchase"])
    per = np.array_split(np.arange(n), len(types))
    ts = np.empty(n, dtype=np.int64)
    typ = np.empty(n, dtype=object)
    for t, idx in zip(types, per):
        gaps_ms = rng.lognormal(mean=8.0, sigma=3.0, size=len(idx))
        ts[idx] = np.cumsum(gaps_ms * 1000.0).astype(np.int64)  # us
        typ[idx] = t
    order = np.argsort(ts, kind="stable")
    ts, typ = ts[order], typ[order]
    n_users = max(n // 50, 1)
    user = (rng.zipf(1.6, size=n) - 1) % n_users
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts + 1_700_000_000_000_000, pa.timestamp("us")),
        "user_id": pa.array(user.astype(np.int64), pa.int64()),
        "event_type": pa.array(typ.tolist(), pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 200, n), 2), pa.float64()),
        "props": pa.array(
            [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n)],
            pa.string()),
    })


def gen_documents_adversarial(fitted: dict, n: int,
                              rng: np.random.Generator, p_sub: float = 0.02):
    """ADVERSARIAL near-dup corpus for the hot-bucket-cap check: every
    document is a light (2% word substitution) mutation of ONE 60-word
    base, so MinHash bands collide massively — without the MAX_BUCKET
    cap the banded self-join would emit ~n^2/2 candidate pairs.  The
    cap's documented contract is that candidate generation stays
    bounded; this corpus measures it instead of asserting it."""
    vocab = np.array(fitted["vocab"])
    base = rng.choice(vocab, size=60, p=fitted["wp"])
    texts = []
    for _ in range(n):
        w = base.copy()
        sub = rng.random(len(w)) < p_sub
        w[sub] = rng.choice(vocab, size=int(sub.sum()), p=fitted["wp"])
        texts.append(" ".join(w))
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array([f"s{i % 20}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=float, default=10.0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "_scale", "sf1"))
    ap.add_argument("--events", type=int, default=0, metavar="N",
                    help="ALSO write an N-row adversarial continuous-gap "
                         "events.parquet (and nothing else if --events-only)")
    ap.add_argument("--events-only", action="store_true")
    ap.add_argument("--adv-docs", type=int, default=0, metavar="N",
                    help="write ONLY an N-row adversarial all-near-dup "
                         "documents.parquet (hot-bucket-cap check)")
    args = ap.parse_args()
    rng = np.random.default_rng(42)
    os.makedirs(args.out, exist_ok=True)
    if args.adv_docs:
        fitted = fit_documents(BASE)
        docs = gen_documents_adversarial(fitted, args.adv_docs, rng)
        pq.write_table(docs, os.path.join(args.out, "documents.parquet"))
        print(f"wrote {docs.num_rows} adversarial near-dup docs -> {args.out}")
        return
    if args.events:
        ev = gen_events_adversarial(args.events, rng)
        pq.write_table(ev, os.path.join(args.out, "events.parquet"))
        print(f"wrote {ev.num_rows} adversarial events -> {args.out}")
        if args.events_only:
            return
    fitted = fit_documents(BASE)
    docs = gen_documents(fitted, int(fitted["n"] * args.mult), rng)
    pq.write_table(docs, os.path.join(args.out, "documents.parquet"))
    n_emb = pq.read_metadata(
        os.path.join(BASE, "embeddings.parquet")).num_rows
    emb = gen_embeddings(BASE, int(n_emb * args.mult), rng)
    pq.write_table(emb, os.path.join(args.out, "embeddings.parquet"))
    print(f"wrote {docs.num_rows} docs, {emb.num_rows} embeddings -> "
          f"{args.out}")


if __name__ == "__main__":
    main()
