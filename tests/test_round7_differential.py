"""Seeded differential sweeps for the late round-7 operators: random
corpora through the Spark operator vs a pure-Python reference
implementing the same published algorithm with the same tie-breaks.
This is the test class that would have caught the bpe_train
fully-merged-word crash before a reviewer did — adversarial shapes
(single-char words, runs like 'aaaa', words that fully merge within
n_merges) arise naturally from the random draw."""

from __future__ import annotations

import random

import pytest


# ---------------------------------------------------------------- BPE


def _ref_bpe(words_freq: dict, n_merges: int):
    """Sennrich et al. 2016 reference: overlapping pair stats, merge
    argmax with (freq DESC, pair ASC) tie-break on left+\\x01+right,
    left-to-right non-overlapping application."""
    toks = {w: tuple(list(w) + ["</w>"]) for w in words_freq}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for w, f in words_freq.items():
            t = toks[w]
            for i in range(len(t) - 1):
                pairs[(t[i], t[i + 1])] = pairs.get((t[i], t[i + 1]), 0) + f
        if not pairs:
            break
        best_pair, best_freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + "\x01" + kv[0][1])
        )
        left, right = best_pair
        merges.append((left, right, best_freq))

        def apply(t, L=left, R=right):
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == L and t[i + 1] == R:
                    out.append(L + R)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            return tuple(out)

        toks = {w: apply(t) for w, t in toks.items()}
    return merges


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6, 7, 8])
def test_bpe_train_matches_reference(spark, seed):
    from bb_bigdata_log_tools_spark.operators.textprep import bpe_train

    rng = random.Random(seed)
    alphabet = "abc"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 5)))
        for _ in range(rng.randint(3, 12))
    ]
    # random repetition so frequencies (and ties) vary
    corpus_words = [w for w in words for _ in range(rng.randint(1, 4))]
    rng.shuffle(corpus_words)
    text = " ".join(corpus_words)
    freqs: dict = {}
    for w in corpus_words:
        freqs[w] = freqs.get(w, 0) + 1

    n_merges = rng.randint(1, 4)
    expected = _ref_bpe(freqs, n_merges)

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [
        (r.left, r.right, r.pair_freq)
        for r in bpe_train(docs, n_merges=n_merges).collect()
    ]
    assert got == expected, (seed, text, got, expected)


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_bpe_apply_matches_reference(spark, seed):
    """bpe_apply must tokenize each document to exactly the token
    counts the reference BPE yields after the same merges."""
    from bb_bigdata_log_tools_spark.operators.textprep import bpe_apply

    rng = random.Random(seed)
    alphabet = "ab"
    vocab = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 4)))
        for _ in range(6)
    ]
    docs_py = {
        doc_id: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10)))
        for doc_id in range(1, 5)
    }
    freqs: dict = {}
    for t in docs_py.values():
        for w in t.split(" "):
            freqs[w] = freqs.get(w, 0) + 1
    n_merges = 2

    # reference tokenization: re-run the reference merges and apply
    toks = {w: tuple(list(w) + ["</w>"]) for w in freqs}
    for left, right, _ in _ref_bpe(freqs, n_merges):
        def apply(t, L=left, R=right):
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == L and t[i + 1] == R:
                    out.append(L + R)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            return tuple(out)

        toks = {w: apply(t) for w, t in toks.items()}
    expected = {
        doc_id: (
            len(t.split(" ")),
            sum(len(toks[w]) for w in t.split(" ")),
        )
        for doc_id, t in docs_py.items()
    }

    docs = spark.createDataFrame(
        list(docs_py.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe_apply(docs, n_merges=n_merges).collect()
    }
    assert got == expected, (seed, docs_py, got, expected)


# --------------------------------------------------------- dedup_lines


def _ref_dedup_lines(texts: dict, min_count: int, sep: str):
    """C4 line filter reference: corpus-wide count per lower(strip(line))
    including within-doc repeats; drop lines with count >= min_count;
    reassemble in order."""
    counts: dict = {}
    for t in texts.values():
        for ln in t.split(sep):
            k = ln.strip().lower()
            counts[k] = counts.get(k, 0) + 1
    out = {}
    for doc_id, t in texts.items():
        lines = t.split(sep)
        kept = [ln for ln in lines if counts[ln.strip().lower()] < min_count]
        out[doc_id] = (
            len(lines),
            sum(1 for ln in lines if counts[ln.strip().lower()] >= min_count),
            sep.join(kept),
        )
    return out


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_dedup_lines_matches_reference(spark, seed):
    from bb_bigdata_log_tools_spark.operators.dedup import dedup_lines

    rng = random.Random(seed)
    pool = [
        "",  # blank lines are the hottest real-world repeated key
        "All Rights Reserved",
        "  all rights reserved ",  # same key after trim+lower
        "cookie banner",
        "nav | home | about",
    ] + [f"unique prose {seed}-{i}" for i in range(30)]
    texts = {
        doc_id: "\n".join(
            rng.choice(pool) for _ in range(rng.randint(1, 8))
        )
        for doc_id in range(1, rng.randint(4, 10))
    }
    ref = _ref_dedup_lines(texts, min_count=2, sep="\n")

    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_lines, r.n_removed, r.n_chars_kept)
        for r in dedup_lines(docs, min_count=2).collect()
    }
    for doc_id, (n_lines, n_removed, kept_text) in ref.items():
        assert got[doc_id] == (n_lines, n_removed, len(kept_text)), (
            seed, doc_id, texts[doc_id], got[doc_id], ref[doc_id],
        )
