"""Differential tests for the fused scorer fast paths (round-6 optimization):

- DictScorer.mentions_fast == gp_decode_cells(ner_cells(...)) for ANY vocab
  (pure fusion — same generated set).
- DictScorer.triples_fast == gplinker_decode_cells(*re_cells(...)) under the
  _affix_free precondition (position attribution is unique); the fused
  pipeline gates on that flag and keeps the generic decode otherwise.
- clique_search's process-wide shape memo returns identical results on
  repeated graph shapes over different argument tuples.
"""

from __future__ import annotations

import random

from fastie_spark.decoders import (
    clique_search,
    gp_decode_cells,
    gplinker_decode_cells,
)
from fastie_spark.fixtures import build_vocab
from fastie_spark.scorer import DictScorer, Vocab
from fastie_spark.tokenizer import encode_meta


def _mk_scorer(rng, surfs):
    ents = [(s, rng.choice(["A", "B"])) for s in surfs]
    rels = sorted(
        {
            (a, rng.choice(["p", "q"]), b)
            for a in surfs
            for b in surfs
            if a != b and rng.random() < 0.3
        }
    )
    v = Vocab(entity_vocab=ents, relation_vocab=rels, event_vocab=[])
    return v, DictScorer(v, 512)


def test_fast_paths_match_generic_decode_fuzz():
    rng = random.Random(99)
    alpha = "abcd汉字 "
    checked_fast = checked_fallback = 0
    for _ in range(120):
        surfs = list(
            {
                "".join(rng.choice(alpha) for _ in range(rng.randint(2, 5)))
                .replace(" ", "-")  # pre-masked surfaces
                for _ in range(rng.randint(2, 8))
            }
        )
        v, sc = _mk_scorer(rng, surfs)
        id2l = dict(enumerate(v.ner_labels()))
        id2p = dict(enumerate(v.predicates()))
        for _ in range(4):
            text = "".join(
                rng.choice(surfs)
                if rng.random() < 0.5
                else "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(2, 25))
            )
            masked = text.replace(" ", "-")
            enc = encode_meta(masked, 512)
            l, mp = enc["seq_len"], enc["offset_mapping"]
            slow_m = gp_decode_cells(sc.ner_cells(masked), l, text, mp, id2l)
            assert sc.mentions_fast(masked, text, mp, id2l) == slow_m
            if sc._affix_free:
                slow_t = gplinker_decode_cells(
                    *sc.re_cells(masked), l, text, mp, id2p
                )
                assert sc.triples_fast(masked, text, mp, id2p) == slow_t
                checked_fast += 1
            else:
                checked_fallback += 1
    # both branches must actually have been exercised
    assert checked_fast > 0 and checked_fallback > 0


def test_bench_vocab_is_affix_free_and_fast_path_fires():
    sc = DictScorer(build_vocab(), 512)
    assert sc._affix_free


def test_clique_shape_memo_is_content_independent():
    # same adjacency shape over DIFFERENT argu tuples: first call populates
    # the process-wide memo, second call must project the memoized masks
    # onto the new tuples identically to a fresh search
    links1 = {(1, 2, 3, 4), (3, 4, 1, 2), (3, 4, 5, 6), (5, 6, 3, 4)}
    a1 = [("e", "r1", 1, 2), ("e", "r2", 3, 4), ("e", "r3", 5, 6)]
    r1 = clique_search(a1, links1)
    links2 = {(7, 8, 9, 10), (9, 10, 7, 8), (9, 10, 11, 12), (11, 12, 9, 10)}
    a2 = [("x", "s1", 7, 8), ("x", "s2", 9, 10), ("x", "s3", 11, 12)]
    r2 = clique_search(a2, links2)
    # path graph 1-2-3: maximal complete subgraphs {1,2} and {2,3}
    assert [[(x[2], x[3]) for x in c] for c in r1] == [
        [(1, 2), (3, 4)],
        [(3, 4), (5, 6)],
    ]
    assert [[(x[2], x[3]) for x in c] for c in r2] == [
        [(7, 8), (9, 10)],
        [(9, 10), (11, 12)],
    ]


def test_event_views_matches_generic_decode_fuzz():
    """DictScorer.event_views + event_decode_from_argus must equal
    scorer.event_cells + event_decode_cells for any vocab/text (the fused
    pipeline's event branch vs the oracle's generic path)."""
    from fastie_spark.decoders import (
        event_decode_cells,
        event_decode_from_argus,
        event_set2json,
    )
    from fastie_spark.tokenizer import encode_meta

    rng = random.Random(7)
    alpha = "abc汉字xy "
    roles = ["触发词", "time", "who", "where"]
    for _ in range(80):
        surfs = list(
            {
                "".join(rng.choice(alpha) for _ in range(rng.randint(2, 5)))
                .replace(" ", "-")
                for _ in range(rng.randint(2, 8))
            }
        )
        evs = []
        for _ in range(rng.randint(1, 4)):
            etype = rng.choice(["eA", "eB"])
            args = [(r, rng.choice(surfs)) for r in roles
                    if rng.random() < 0.7]
            if args:
                evs.append((etype, args))
        if not evs:
            continue
        v = Vocab(entity_vocab=[], relation_vocab=[], event_vocab=evs)
        sc = DictScorer(v, 512)
        id2l = dict(enumerate(v.event_labels()))
        for _ in range(4):
            text = "".join(
                rng.choice(surfs)
                if rng.random() < 0.5
                else "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(2, 20))
            )
            masked = text.replace(" ", "-")
            enc = encode_meta(masked, 512)
            l, mp = enc["seq_len"], enc["offset_mapping"]
            argu, eh, et = sc.event_cells(masked)
            slow = event_set2json(
                event_decode_cells(argu, eh, et, l, text, mp, id2l)
            )
            argus2, eh2, et2 = sc.event_views(masked)
            fast = event_set2json(
                event_decode_from_argus(argus2, eh2, et2, text, mp)
            )
            assert fast == slow, (text, fast, slow)
