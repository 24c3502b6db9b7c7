"""Model-based property tests: the distributed curation operators must
agree with trivially-correct single-process Python models on arbitrary
small corpora (hypothesis-generated), the same way the resample/funnel
operators are guarded."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from xorq_spark.functions import line_dedup, pack_sequences

_WORDS = ["aa", "bb", "cc", "dd", "ee"]

_docs = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=9),
    min_size=1,
    max_size=8,
).map(
    lambda ds: [(i, " ".join(toks)) for i, toks in enumerate(ds)]
)

_lined_docs = st.lists(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3).map(" ".join),
        min_size=0,
        max_size=5,
    ).map("\n".join),
    min_size=1,
    max_size=6,
).map(lambda ds: [(i, t) for i, t in enumerate(ds)])


def _line_dedup_model(rows, max_docs):
    from collections import Counter

    doc_lines = {
        i: [l for l in t.split("\n") if l.strip() != ""] for i, t in rows
    }
    freq = Counter()
    for lines in doc_lines.values():
        for key in {l.strip() for l in lines}:
            freq[key] += 1
    out = {}
    for i, lines in doc_lines.items():
        kept = [l for l in lines if freq[l.strip()] <= max_docs]
        out[i] = ("\n".join(kept), len(lines), len(kept))
    return out


@given(rows=_lined_docs, max_docs=st.sampled_from([1, 2]))
@settings(max_examples=12, deadline=None)
def test_line_dedup_matches_counter_model(spark, rows, max_docs):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_deduped"], r["n_lines"], r["n_kept_lines"])
        for r in line_dedup(df, max_docs=max_docs).collect()
    }
    assert got == _line_dedup_model(rows, max_docs)


def _pack_model(rows, seq_tokens):
    stream = []
    for _i, text in sorted(rows):
        stream.extend(text.split())
    seqs = {}
    for pos, tok in enumerate(stream):
        seqs.setdefault(pos // seq_tokens, []).append(tok)
    return {
        sid: (" ".join(toks), len(toks)) for sid, toks in seqs.items()
    }


@given(rows=_docs, seq_tokens=st.sampled_from([3, 5, 16]))
@settings(max_examples=12, deadline=None)
def test_pack_sequences_matches_stream_model(spark, rows, seq_tokens):
    df = spark.createDataFrame(
        [(i, "en", t) for i, t in rows], "doc_id long, lang string, text string"
    )
    got = {
        r["seq_id"]: (r["seq_text"], r["n_tokens"])
        for r in pack_sequences(
            df, seq_tokens=seq_tokens, partition_cols=("lang",)
        ).collect()
    }
    assert got == _pack_model(rows, seq_tokens)


# ---- round 4 continuation: gopher_repetition / nb_classify / kmeans /
# scd2 vs single-process Python models --------------------------------


def _rep_model(rows, sep="\n", top_ns=(2,), dup_ns=(3,)):
    """Trivially-correct per-doc repetition metrics."""
    from collections import Counter

    out = {}
    for i, t in rows:
        t = t or ""
        segs = [x.strip() for x in t.split(sep) if x.strip() != ""]
        n, uniq = len(segs), list(dict.fromkeys(segs))
        chars = sum(map(len, segs))
        uchars = sum(map(len, uniq))
        toks = t.split()
        lens = [len(x) for x in toks]
        res = {
            "dup_line_frac": round((n - len(uniq)) / max(n, 1), 9),
            "dup_line_char_frac": round((chars - uchars) / max(chars, 1), 9),
        }
        for k in top_ns:
            grams = [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]
            if grams:
                cnt = Counter(grams)
                m = max(cnt.values())
                bestg = min(g for g, c in cnt.items() if c == m)
                val = m * len(bestg)
            else:
                val = 0
            res[f"top_{k}gram_char_frac"] = round(val / max(len(t), 1), 9)
        for k in dup_ns:
            grams = [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]
            cnt = Counter(grams)
            covered = set()
            for j, g in enumerate(grams):
                if cnt[g] > 1:
                    covered.update(range(j, j + k))
            cov_chars = sum(lens[p] for p in covered)
            res[f"dup_{k}gram_char_frac"] = round(
                cov_chars / max(sum(lens), 1), 9
            )
        out[i] = res
    return out


@given(rows=_lined_docs)
@settings(max_examples=10, deadline=None)
def test_gopher_repetition_matches_model(spark, rows):
    from xorq_spark.functions import gopher_repetition

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in gopher_repetition(
            df, top_ns=(2,), dup_ns=(3,)
        ).collect()
    }
    model = _rep_model(rows)
    for i, m in model.items():
        for key, v in m.items():
            assert got[i][key] == v, (i, key, got[i][key], v)


def _nb_model(rows, k=1):
    """Float model of the integer nano-nat NB — compare argmax/pred
    only (scores agree to ~1e-9 relative, argmax must match exactly
    when the float gap is far above quantization error)."""
    import math
    from collections import Counter, defaultdict

    docs = [(i, (t or "").lower().split(), lab) for i, t, lab in rows]
    nd = len(docs)
    ndc = Counter(lab for _, _, lab in docs)
    ntc = Counter()
    wc = defaultdict(Counter)
    vocab = set()
    for _, toks, lab in docs:
        ntc[lab] += len(toks)
        for w in toks:
            wc[lab][w] += 1
            vocab.add(w)
    V = len(vocab)
    out = {}
    for i, toks, _ in docs:
        best = None
        for c in sorted(ndc):
            den = ntc[c] + k * V
            s = round(math.log(ndc[c] / nd) * 1e9)
            for w in toks:
                p = (wc[c][w] + k) / den if wc[c][w] else k / den
                s += round(math.log(p) * 1e9)
            if best is None or s > best[0]:
                best = (s, c)
        out[i] = best[1]
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6),
            st.sampled_from(["x", "y"]),
        ),
        min_size=2,
        max_size=8,
    ).map(
        lambda ds: [(i, " ".join(t), lab) for i, (t, lab) in enumerate(ds)]
    )
)
@settings(max_examples=10, deadline=None)
def test_nb_classify_matches_model(spark, rows):
    from xorq_spark.functions import nb_classify

    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r["pred"] for r in nb_classify(df).collect()}
    assert got == _nb_model(rows)


def _kmeans_model(rows, k, iterations, scale=10**6):
    import hashlib
    import math

    q = {
        i: [int(math.floor(x * scale + 0.5)) + scale for x in v]
        for i, v in rows
    }
    order = sorted(q, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    ctrs = {c: q[i] for c, i in enumerate(order[:k])}
    assign = {}
    for _ in range(iterations):
        assign = {}
        for i, v in q.items():
            assign[i] = min(
                (sum((a - b) ** 2 for a, b in zip(v, c)), ci)
                for ci, c in sorted(ctrs.items())
            )[1]
        new = {}
        for ci in sorted(set(assign.values())):
            members = [q[i] for i in q if assign[i] == ci]
            new[ci] = [
                sum(col) // len(members) for col in zip(*members)
            ]
        ctrs = new
    return assign


@given(
    rows=st.lists(
        st.lists(
            st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=3,
        max_size=12,
    ).map(lambda vs: [(i, v) for i, v in enumerate(vs)]),
    k=st.sampled_from([2, 3]),
)
@settings(max_examples=10, deadline=None)
def test_kmeans_matches_model(spark, rows, k):
    from xorq_spark.functions.clustering import kmeans

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans(df, k=k, iterations=2).collect()
    }
    # model must quantize from the SAME float32 values spark reads
    import struct

    rows32 = [
        (i, [struct.unpack("f", struct.pack("f", x))[0] for x in v])
        for i, v in rows
    ]
    assert got == _kmeans_model(rows32, k, 2)


def _scd2_model(rows):
    hist = {}
    by_key = {}
    for u, ts, v, eid in sorted(rows, key=lambda r: (r[0], r[1], r[3])):
        by_key.setdefault(u, []).append((ts, v))
    for u, seq in by_key.items():
        changes = []
        prev = object()
        for ts, v in seq:
            if v != prev:
                changes.append((ts, v))
                prev = v
        out = []
        for n, (ts, v) in enumerate(changes):
            vt = changes[n + 1][0] if n + 1 < len(changes) else None
            out.append((v, ts, vt, n + 1, vt is None))
        hist[u] = out
    return hist


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),     # user
            st.integers(min_value=0, max_value=20),    # hour offset
            st.sampled_from(["a", "b"]),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda r: (r[0], r[1]),
    )
)
@settings(max_examples=10, deadline=None)
def test_scd2_matches_model(spark, rows):
    from datetime import datetime, timedelta

    from xorq_spark.functions.timeseries import scd2

    t0 = datetime(2024, 1, 1)
    data = [
        (u, t0 + timedelta(hours=h), v, n)
        for n, (u, h, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp_ntz, event_type string, event_id long"
    )
    got = {}
    for r in scd2(df, ("user_id",), ("event_type",), "ts", ("event_id",)).collect():
        got.setdefault(r["user_id"], []).append(
            (r["event_type"], r["valid_from"], r["valid_to"], r["version"], r["is_current"])
        )
    for u in got:
        got[u].sort(key=lambda x: x[3])
    model = _scd2_model(data)
    assert got == model


# ---- url_normalize vs a stdlib urllib model; html_to_text invariants --


def _url_model(u):
    """Independent model built on urllib.parse (not regexes): same
    canonicalization rules, different machinery."""
    from urllib.parse import urlsplit

    u = (u or "").strip()
    try:
        parts = urlsplit(u)
    except ValueError:
        return u
    if not parts.scheme or "://" not in u:
        return u
    scheme = parts.scheme.lower()
    host = (parts.netloc or "").lower()
    if host.startswith("www."):
        host = host[4:]
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = parts.path.rstrip("/")
    import re

    kept = sorted(
        p
        for p in parts.query.split("&")
        if p
        and not re.match(
            r"^(utm_[a-z]+|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)=", p
        )
    )
    qs = "?" + "&".join(kept) if kept else ""
    return f"{scheme}://{host}{path}{qs}"


_url_strategy = st.builds(
    lambda scheme, www, host, port, path, params, frag: (
        scheme
        + "://"
        + ("www." if www else "")
        + host
        + port
        + path
        + ("?" + "&".join(params) if params else "")
        + frag
    ),
    scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
    www=st.booleans(),
    host=st.sampled_from(["Example.com", "a.b.co", "X9.org"]),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.sampled_from(["", "/", "/a", "/a/b/", "/a%20b"]),
    params=st.lists(
        st.sampled_from(
            ["a=1", "b=2", "z=9", "utm_source=x", "gclid=5", "ref=t"]
        ),
        max_size=4,
        unique=True,
    ),
    frag=st.sampled_from(["", "#f", "#x=1"]),
)


@given(urls=st.lists(_url_strategy, min_size=1, max_size=8))
@settings(max_examples=15, deadline=None)
def test_url_normalize_matches_urllib_model(spark, urls):
    import pyspark.sql.functions as F

    from xorq_spark.functions.text import url_normalize

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i int, u string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", url_normalize(F.col("u")).alias("n")).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == _url_model(u), (u, got[i], _url_model(u))


_html_bits = st.lists(
    st.sampled_from(
        [
            "plain words here",
            "<p>para</p>",
            "<div class='x'>block</div>",
            "<b>bold</b>",
            "<script>var SECRET = '<p>fake</p>';</script>",
            "<style>.c { color: red; }</style>",
            "<!-- HIDDEN -->",
            "a &amp; b",
            "<ul><li>item</li></ul>",
            "<br>",
        ]
    ),
    min_size=1,
    max_size=8,
)


@given(bits=_html_bits)
@settings(max_examples=15, deadline=None)
def test_html_to_text_invariants(spark, bits):
    """No tags survive, script/style/comment payloads never leak,
    plain words always survive."""
    import pyspark.sql.functions as F

    from xorq_spark.functions.text import html_to_text

    html = "".join(bits)
    df = spark.createDataFrame([(html,)], "h string")
    [r] = df.select(html_to_text(F.col("h")).alias("t")).collect()
    out = r["t"]
    assert "<p>" not in out and "</" not in out
    assert "SECRET" not in out and "HIDDEN" not in out
    assert "color" not in out
    if "plain words here" in html:
        assert "plain words here" in out
    if "<p>para</p>" in html:
        assert "para" in out
