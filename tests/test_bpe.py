"""X45 BPE training: the distributed merge table must match a pure-
Python reference implementation EXACTLY (same corpus, same tie rules)."""

from __future__ import annotations

from collections import Counter, defaultdict

from etl_airflow_spotify_spark.operators.bpe import EOW, train_bpe


def _py_bpe(texts, n_merges, with_stats=False):
    wf = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            wf[w] += 1
    vocab = {}
    for w, f in wf.items():
        syms = list(w)
        syms[-1] = syms[-1] + EOW
        vocab[w] = (tuple(syms), f)
    merges = []
    for rank in range(1, n_merges + 1):
        pc = defaultdict(int)
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        # max count, ties -> lexicographically smallest pair
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        ab = a + b
        for w, (syms, f) in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = ab
                else:
                    out.append(s)
            vocab[w] = (tuple(out), f)
        if with_stats:
            total = sum(len(syms) * f for syms, f in vocab.values())
            merges.append((rank, a, b, cnt, total))
        else:
            merges.append((rank, a, b, cnt))
    return merges


def _corpus_df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_bpe_matches_python_reference_toy(spark):
    texts = ["low low low lower lowest", "new newer newest new new",
             "wide wider widest low new"]
    got = train_bpe(_corpus_df(spark, texts), 8)
    assert got == _py_bpe(texts, 8)
    got_s = [tuple(t) for t in
             train_bpe(_corpus_df(spark, texts), 4, with_stats=True)]
    assert got_s == _py_bpe(texts, 4, with_stats=True)


def test_bpe_overlapping_runs_merge_left_to_right(spark):
    # "aaaa": pair (a,a) merges non-overlapping left-to-right
    texts = ["aaaa aaaa aa b"]
    got = train_bpe(_corpus_df(spark, texts), 3)
    assert got == _py_bpe(texts, 3)
    # first merge is the interior (a, a) pair
    assert (got[0][1], got[0][2]) == ("a", "a")


def test_bpe_on_sf_documents(spark, sf_dir):
    from etl_airflow_spotify_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in d.select("text").collect()]
    got = train_bpe(d, 6)
    assert got == _py_bpe(texts, 6)


def _py_encode(texts, n_merges):
    """Final word -> symbol-count map + per-doc (n_words, n_bpe_tokens)
    from the pure-Python reference, mirroring bpe_encode_stats."""
    merges = _py_bpe(texts, n_merges)
    vocab = {}
    for t in texts:
        for w in t.strip().lower().split():
            if w not in vocab:
                syms = list(w)
                syms[-1] = syms[-1] + EOW
                vocab[w] = syms
    for _, a, b, _c in merges:
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    per_doc = []
    for t in texts:
        toks = t.strip().lower().split()
        per_doc.append((len(toks), sum(len(vocab[w]) for w in toks)))
    return per_doc


def test_bpe_encode_stats_matches_python_reference(spark, sf_dir):
    from etl_airflow_spotify_spark.queries.text import (BPE_MERGES,
                                                        bpe_encode_stats)
    from etl_airflow_spotify_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").orderBy("doc_id")
    rows = d.select("doc_id", "text").collect()
    texts = [r["text"] for r in rows]
    expected = {r["doc_id"]: pd for r, pd in
                zip(rows, _py_encode(texts, BPE_MERGES))}
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
           for r in bpe_encode_stats(spark, sf_dir).collect()}
    assert got == expected


def test_bpe_train_return_vocab_consistent(spark):
    texts = ["low low low lower lowest", "new newer newest new new"]
    merges, vocab = train_bpe(_corpus_df(spark, texts), 5,
                              return_vocab=True)
    assert merges == _py_bpe(texts, 5)
    got = {r["word"]: tuple(r["syms"]) for r in vocab.collect()}
    # re-derive the reference final vocabulary
    ref_docs = _py_encode(texts, 5)  # noqa: F841 — exercises the path
    wf = {}
    for t in texts:
        for w in t.strip().lower().split():
            wf.setdefault(w, list(w))
    for w, syms in wf.items():
        syms[-1] = syms[-1] + EOW
    for _, a, b, _c in merges:
        for w, syms in wf.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            wf[w] = out
    assert got == {w: tuple(s) for w, s in wf.items()}
