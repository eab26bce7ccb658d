"""Unit tests for the dependency-free core: tokenizer, chunking, decoders.

Decode expectations are handwritten from the reference semantics
(file:line cites in fastie_spark/decoders.py)."""

import numpy as np

from fastie_spark.chunking import auto_splitter, char_bases, cut_chinese_sent, split_one
from fastie_spark.decoders import (
    dbc2sbc,
    event_decode_cells,
    event_set2json,
    get_bool_ids_greater_than,
    get_span,
    gp_decode_cells,
    gp_decode_dense,
    gplinker_decode_cells,
    gplinker_decode_dense,
    w2ner_decode_grid,
)
from fastie_spark.scorer import DictScorer, Vocab, find_all
from fastie_spark.tokenizer import char_span_to_token_span, encode


def test_tokenizer_contract():
    enc = encode("abc", 512)
    assert enc["input_ids"][0] == 1 and enc["input_ids"][-1] == 2
    assert enc["offset_mapping"] == [(0, 0), (0, 1), (1, 2), (2, 3), (0, 0)]
    assert enc["seq_len"] == 5
    # truncation: max_length-2 content tokens kept
    enc = encode("x" * 600, 512)
    assert enc["seq_len"] == 512
    assert enc["offset_mapping"][510] == (509, 510)
    assert char_span_to_token_span(3, 7) == (4, 7)


def test_auto_splitter_fixed_window():
    texts = ["a" * 1200, "short"]
    chunks, mapping = auto_splitter(texts, 510)
    assert mapping == {0: [0, 1, 2], 1: [3]}
    assert [len(c) for c in chunks] == [510, 510, 180, 5]
    assert char_bases(chunks[:3]) == [0, 510, 1020]
    assert split_one("a" * 1200, 510) == chunks[:3]


def test_cut_chinese_sent():
    assert cut_chinese_sent("你好。世界！再见？末尾") == ["你好。", "世界！", "再见？", "末尾"]
    # closing quote stays attached to the preceding sentence, split after it
    assert cut_chinese_sent("他说“走。”然后离开。") == ["他说“走。”", "然后离开。"]
    # but no split when the quote is followed by a comma
    assert cut_chinese_sent("他说“走。”，然后离开") == ["他说“走。”，然后离开"]


def test_gp_decode_semantics():
    # grid [1 label, L=6] for text "abcd": tokens CLS a b c d SEP, l=6
    text = "abcd"
    enc = encode(text, 512)
    mapping, l = enc["offset_mapping"], enc["seq_len"]
    grid = np.full((1, 6, 6), -1.0)
    grid[0, 2, 3] = 1.0  # chars b..c
    grid[0, 0, 3] = 1.0  # CLS start -> excluded (0 in [s,e])
    grid[0, 2, 5] = 1.0  # end >= l-1 -> excluded
    out = gp_decode_dense(grid, l, text, mapping, {0: "per"})
    assert out == {("per", 1, 3, "bc")}
    # sparse path identical
    cells = set(zip(*np.where(grid > 0.0)))
    assert gp_decode_cells(cells, l, text, mapping, {0: "per"}) == out


def test_gplinker_decode_semantics():
    text = "AliceBerlin"
    enc = encode(text, 512)
    mapping, l = enc["offset_mapping"], enc["seq_len"]
    L = l
    ent = np.full((2, L, L), -1.0)
    head = np.full((1, L, L), -1.0)
    tail = np.full((1, L, L), -1.0)
    # subject Alice = chars 0..4 -> tokens 1..5; object Berlin = 5..10 -> 6..11
    ent[0, 1, 5] = 1.0
    ent[1, 6, 11] = 1.0
    head[0, 1, 6] = 1.0
    tail[0, 5, 11] = 1.0
    out = gplinker_decode_dense(ent, head, tail, l, text, mapping, {0: "born_in"})
    assert out == {("born_in", "Alice", "Berlin")}
    # missing tail link -> no triple
    tail2 = np.full((1, L, L), -1.0)
    assert (
        gplinker_decode_dense(ent, head, tail2, l, text, mapping, {0: "born_in"})
        == set()
    )


def test_event_decode_and_dedup():
    text = "X裁员900人Y"
    enc = encode(text, 512)
    mapping, l = enc["offset_mapping"], enc["seq_len"]
    id2label = {0: "org-layoff@count", 1: "org-layoff@触发词"}
    # trigger 裁员 tokens 2..3, count 900人 tokens 4..7
    argu = {(1, 2, 3), (0, 4, 7)}
    head = {(2, 4)}
    tail = {(3, 7)}
    events = event_decode_cells(argu, head, tail, l, text, mapping, id2label)
    assert len(events) == 1
    dicts = event_set2json(events)
    assert dicts[0]["event_type"] == "org-layoff"
    assert dicts[0]["trigger"] == "裁员"
    assert dicts[0]["arguments"] == [{"role": "count", "argument": "900人"}]
    # without the link, clique search splits into two events; the
    # trigger-less one is dropped
    events2 = event_decode_cells(argu, set(), set(), l, text, mapping, id2label)
    assert len(events2) == 1 and events2[0][0][1] == "触发词"
    # subset dedup: an event contained in another is removed
    ev_small = [[("t", "触发词", "a", 0, 1)]]
    ev_big = [[("t", "触发词", "a", 0, 1), ("t", "r", "b", 2, 3)]]
    assert len(event_set2json(ev_small + ev_big)) == 1


def test_w2ner_decode():
    text = "abcde"
    # entity "bcd": NNW (1,2),(2,3); THW at (3,1) label 2
    grid = {(1, 2): 1, (2, 3): 1, (3, 1): 2}
    out = w2ner_decode_grid(grid, 5, text, {0: "NONE", 1: "NNW", 2: "per"})
    assert out == {("per", 1, 4, "bcd")}
    # discontinuous entity: a-c-e via NNW jumps
    grid = {(0, 2): 1, (2, 4): 1, (4, 0): 2}
    out = w2ner_decode_grid(grid, 5, text, {0: "NONE", 1: "NNW", 2: "per"})
    assert out == {("per", 0, 5, "ace")}


def test_uie_span_helpers():
    assert get_bool_ids_greater_than([0.1, 0.9, 0.6], 0.5) == [1, 2]
    assert get_span([1, 5], [2, 6]) == {(1, 2), (5, 6)}
    # nearest-end pairing: start 1 pairs with first end >= it
    assert get_span([1], [0, 3]) == {(1, 3)}
    # note: the reference's 0x21..0x7e gate means the ideographic space
    # (U+3000 -> 0x20) is NOT converted — faithful quirk
    assert dbc2sbc("Ａｂｃ１　x") == "Abc1　x"


def test_scorer_truncation_and_overlap():
    v = Vocab(entity_vocab=[("ab", "per")])
    s = DictScorer(v, max_length=6)  # 4 content tokens
    # occurrence fully inside truncation window only
    cells = s.ner_cells("abxab")
    assert cells == {(0, 1, 2)}  # second 'ab' at chars 3..5 is cut (trunc=4)
    assert find_all("aaa", "aa") == [0, 1]  # overlapping occurrences
