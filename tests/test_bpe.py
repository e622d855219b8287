"""BPE vocabulary induction: distributed == sequential, exact merge table.

Reference contrast: the reference consumes a FIXED WordPiece vocab
(`/root/reference/opennre/tokenization/word_piece_tokenizer.py`); learning
the vocab from the corpus is the training-data-pipeline extension.
"""

import pandas as pd
import pytest
import ray.data as rd

from opennre_ray.functions.bpe import (bpe_learn, bpe_learn_sequential,
                                       word_frequencies)


def test_bpe_learn_matches_sequential(ray_session):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide wide wide",
        "low newer wide wide",
    ]
    ds = rd.from_items([{"text": t} for t in texts]).repartition(3)
    got = bpe_learn(ds, n_merges=10)
    want = bpe_learn_sequential(texts, n_merges=10)
    pd.testing.assert_frame_equal(got, want)
    # sanity on the classic example: a 'low'-family merge appears early
    joined = {l + r for l, r in zip(want["left"], want["right"])}
    assert any(s.startswith("lo") or s.startswith("wi") for s in joined)


def test_bpe_learn_exhausts_pairs_and_stops(ray_session):
    """Single-char words exhaust mergeable pairs after the char+</w>
    merges; the loop must stop early rather than emit empty merges."""
    ds = rd.from_items([{"text": "a b a b a"}])
    got = bpe_learn(ds, n_merges=50)
    want = bpe_learn_sequential(["a b a b a"], n_merges=50)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 2          # 'a</w>' and 'b</w>' only


def test_word_frequencies(ray_session):
    ds = rd.from_items([{"text": "a b b"}, {"text": "b c"}]).repartition(2)
    got = (word_frequencies(ds).to_pandas()
           .sort_values("word").reset_index(drop=True))
    assert got["word"].tolist() == ["a", "b", "c"]
    assert got["freq"].tolist() == [1, 3, 1]
