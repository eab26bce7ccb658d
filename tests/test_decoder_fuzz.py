"""Hypothesis fuzz over the full decoder matrix with ADVERSARIAL
vocabularies (substring containment, overlaps, repeats — cases the
synthetic corpus never generates). Invariants per decoder:

- well-formedness: every mention's surface == the text slice at its span;
  every triple's subject/object occur in the text;
- exact cross-decoder identities that hold by construction
  (gp == tplinker-NER from the same cells; pfn == gplinker;
  gplinker ⊆ onerel);
- determinism: decoding twice gives identical rows.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from fastie_spark.multi_decoder import decode_chunk_all, make_ids
from fastie_spark.scorer import DictScorer, Vocab

WORDS = ["ab", "abc", "b", "bc", "cab", "abab", "ba"]
PREDS = ["p1", "p2"]
LABELS = ["per", "org"]


@st.composite
def vocab_and_text(draw):
    ents = draw(st.lists(
        st.tuples(st.sampled_from(WORDS), st.sampled_from(LABELS)),
        min_size=1, max_size=5, unique_by=lambda t: t[0]))
    rels = draw(st.lists(
        st.tuples(st.sampled_from(WORDS), st.sampled_from(PREDS),
                  st.sampled_from(WORDS)),
        max_size=5, unique=True))
    text = draw(st.text("abcx", min_size=0, max_size=40))
    return Vocab(entity_vocab=sorted(ents), relation_vocab=sorted(rels)), text


@given(vocab_and_text())
@settings(max_examples=150, deadline=None)
def test_decoder_matrix_invariants(vt):
    vocab, text = vt
    scorer = DictScorer(vocab)
    ids = make_ids(vocab)

    rows1 = decode_chunk_all(scorer, ids, text, 0)
    rows2 = decode_chunk_all(scorer, ids, text, 0)
    assert rows1 == rows2  # determinism

    mentions = {}
    triples = {}
    for r in rows1:
        dec, kind = r[0], r[1]
        if kind == "mention":
            mentions.setdefault(dec, set()).add(r[2:6])
        else:
            triples.setdefault(dec, set()).add(r[6:9])

    # well-formedness
    for dec, ms in mentions.items():
        for lbl, s, e, surf in ms:
            assert text[s:e] == surf, (dec, lbl, s, e, surf, text)
    for dec, ts in triples.items():
        for subj, pred, obj in ts:
            assert subj in text and obj in text, (dec, subj, obj, text)

    # exact identities
    assert mentions.get("gp", set()) == mentions.get("tplinker", set())
    assert triples.get("pfn", set()) == triples.get("gplinker", set())
    # OneRel's single argmax tag per grid cell cannot represent triples
    # whose HB-TB / HB-TE / HE-TE cells collide (within or across
    # relations) — faithful tag-collision loss. Invariant: every gplinker
    # triple MISSING from onerel must be explained by a collision, i.e. no
    # occurrence pair has its three cells carrying the expected tags.
    onerel = triples.get("onerel", set())
    missing = triples.get("gplinker", set()) - onerel
    if missing:
        cells = scorer.onerel_cells(text)
        occ = scorer._present(text)
        pred2id = scorer.pred2id
        for subj, pred, obj in missing:
            p = pred2id[pred]
            intact_pair_exists = any(
                cells.get((p, sh, oh)) == 1
                and cells.get((p, sh, ot)) == 2
                and cells.get((p, st, ot)) == 3
                for sh, st in occ.get(subj, [])
                for oh, ot in occ.get(obj, [])
            )
            assert not intact_pair_exists, (subj, pred, obj, text)
