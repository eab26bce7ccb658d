"""Secondary decode semantics (SURVEY.md §2.4 M3-M7, M9-M13), pure python,
shared by oracle and Spark UDFs. File:line cites into /root/reference.

M3  crf_decode + get_entities   .../crf/modeling_crf.py:146-172,
                                 .../crf/decode_utils.py:24-97
M5  span_decode                  .../span/modeling_span.py:133-168
M6  tplinker_ner_decode          .../tplinker/modeling_tplinker.py:137-191
M7  cnn_decode + clash filter    .../cnn/modeling_cnn.py:216-273,
                                 .../cnn/decode_utils.py:130-153
M9  casrel_decode                .../casrel/modeling_casrel.py:157-245
M10 tplinker_re_decode           .../relation_extraction/tplinker/
                                 modeling_tplinker.py:149-243
M11 grte_decode                  .../grte/modeling_grte.py:167-232
M12 onerel_decode                .../onerel/modeling_onerel.py:145-187
M13 PFN == gplinker_decode_cells with sigmoid scores > 0.5
    (.../pfn/modeling_pfn.py:154-202 — same subject/object product)
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# M3: BIO chunker (seqeval-style) + Viterbi CRF decode
# --------------------------------------------------------------------------


def _end_of_chunk(prev_tag, tag, prev_type, type_):
    if (
        prev_tag in {"B", "I"}
        and tag in {"B", "S", "O"}
        or prev_tag not in ["B", "I"]
        and prev_tag in {"E", "S"}
    ):
        return True
    return prev_tag != "O" and prev_tag != "." and prev_type != type_


def _start_of_chunk(prev_tag, tag, prev_type, type_):
    if tag in {"B", "S"}:
        return True
    if prev_tag in {"E", "S", "O"} and tag in {"E", "I"}:
        return True
    return tag != "O" and tag != "." and prev_type != type_


def get_entities(seq: list) -> list:
    """BIO tag sequence -> [(type, start_tok, end_tok_inclusive)]."""
    prev_tag, prev_type, begin_offset = "O", "", 0
    chunks = []
    for i, chunk in enumerate(seq + ["O"]):
        tag = chunk[0]
        type_ = chunk.split("-")[-1]
        if _end_of_chunk(prev_tag, tag, prev_type, type_):
            chunks.append((prev_type, begin_offset, i - 1))
        if _start_of_chunk(prev_tag, tag, prev_type, type_):
            begin_offset = i
        prev_tag, prev_type = tag, type_
    return chunks


def viterbi(emissions: np.ndarray, transitions: np.ndarray | None = None,
            start: np.ndarray | None = None, end: np.ndarray | None = None) -> list:
    """Standard max-sum Viterbi over [L, T] emissions (ties -> lowest tag id,
    np.argmax semantics, matching torchcrf's argmax on CPU)."""
    L, T = emissions.shape
    if transitions is None:
        transitions = np.zeros((T, T))
    if start is None:
        start = np.zeros(T)
    if end is None:
        end = np.zeros(T)
    score = start + emissions[0]
    history = []
    for i in range(1, L):
        broadcast = score[:, None] + transitions + emissions[i][None, :]
        history.append(np.argmax(broadcast, axis=0))
        score = np.max(broadcast, axis=0)
    score = score + end
    best = [int(np.argmax(score))]
    for h in reversed(history):
        best.append(int(h[best[-1]]))
    best.reverse()
    return best


def crf_decode(emissions: np.ndarray, l: int, text: str, mapping,
               id2label: dict, transitions=None) -> set:
    """Viterbi -> drop [CLS]/[SEP] -> BIO chunking -> char spans
    (modeling_crf.py:153-169: tags for masked positions, then [:-1] strips
    SEP; chunk indices are then offset by the leading CLS tag)."""
    ids = viterbi(emissions[:l], transitions)
    tags = [id2label[i] for i in ids][:-1]
    # reference keeps the CLS tag at index 0 (it strips only the tail), so
    # chunk token indices line up with the CLS-shifted offset mapping
    out = set()
    for typ, s, e in get_entities(tags):
        _start, _end = mapping[s][0], mapping[e][1]
        out.add((typ, _start, _end, text[_start:_end]))
    return out


# --------------------------------------------------------------------------
# M4: Cascade-CRF decode (3-tag BIO stage + per-span linear classify)
# --------------------------------------------------------------------------
BIO_MAP = {0: "O", 1: "B-ENT", 2: "I-ENT"}


def cascade_crf_decode(emissions3: np.ndarray, classify_fn, l: int, text: str,
                       mapping, id2label: dict) -> set:
    """Stage 1: Viterbi over 3 tags -> typeless spans (empty -> [[0,0]]);
    stage 2: classify each span (argmax over ['O'] + labels); emit iff
    s*e*p != 0 (modeling_crf.py:274-315). classify_fn(span) -> label id."""
    ids = viterbi(emissions3[:l])
    tags = [BIO_MAP[i] for i in ids][:-1]
    spans = [[s, e] for _, s, e in get_entities(tags)] or [[0, 0]]
    out = set()
    for s, e in spans:
        p = classify_fn((s, e))
        if s * e * p != 0:
            _start, _end = mapping[s][0], mapping[e][1]
            out.add((id2label[p], _start, _end, text[_start:_end]))
    return out


# --------------------------------------------------------------------------
# M5: span-NER decode (nearest same-label end)
# --------------------------------------------------------------------------
def span_decode(start_labels, end_labels, l: int, text: str, mapping,
                id2label: dict) -> set:
    """start/end per-token argmax label ids; id 0 = 'O'
    (modeling_span.py:133-168; label universe ['O'] + sorted schemas)."""
    out = set()
    for i, s in enumerate(start_labels):
        s = int(s)
        if s == 0 or i >= l - 1 or i == 0:
            continue
        for j, e in enumerate(end_labels[i:]):
            e = int(e)
            if i + j >= l - 1:
                continue
            if s == e:
                _start, _end = mapping[i][0], mapping[i + j][1]
                out.add((id2label[s], _start, _end, text[_start:_end]))
                break
    return out


# --------------------------------------------------------------------------
# M6: TPLinker NER (handshake grid)
# --------------------------------------------------------------------------
def tplinker_ner_decode(spots, l: int, text: str, mapping, id2label) -> set:
    """spots: [(s_tok, e_tok, label_id)] above threshold, in shaking-scan
    order (s-major). Rejects s>e / special-token cells
    (modeling_tplinker.py:150-173)."""
    out = set()
    for s, e, lab in spots:
        if s > e or 0 in (s, e) or s >= l - 1 or e >= l - 1:
            continue
        _start, _end = mapping[s][0], mapping[e][1]
        out.add((id2label[lab], _start, _end, text[_start:_end]))
    return out


# --------------------------------------------------------------------------
# M7: CNN-NER decode (greedy confidence clash filter, char-indexed)
# --------------------------------------------------------------------------
def _is_overlapped(c1, c2):
    (_, s1, e1), (_, s2, e2) = c1, c2
    return s1 < e2 and s2 < e1


def _is_nested(c1, c2):
    (_, s1, e1), (_, s2, e2) = c1, c2
    return (s1 <= s2 and e2 <= e1) or (s2 <= s1 and e1 <= e2)


def is_clashed(c1, c2, allow_nested=True):
    if allow_nested:
        return _is_overlapped(c1, c2) and not _is_nested(c1, c2)
    return _is_overlapped(c1, c2)


def filter_clashed_by_priority(chunks, allow_nested=True):
    filtered = []
    for ck in chunks:
        if all(not is_clashed(ck, ex, allow_nested=allow_nested) for ex in filtered):
            filtered.append(ck)
    return filtered


def cnn_decode(scores: np.ndarray, length: int, text: str, id2label,
               thresh: float = 0.5, allow_nested: bool = True) -> set:
    """scores: sigmoid grid [L, L, C] (char-indexed, no CLS). Symmetrize,
    max over classes, threshold over the upper triangle in scan order,
    greedy confidence-sorted clash filtering, then per-span argmax class
    (modeling_cnn.py:216-273)."""
    scores = (scores + scores.transpose(1, 0, 2)) / 2
    span_pred = scores.max(axis=-1)
    cands = []
    for s in range(length):
        for e in range(s, length):
            conf = span_pred[s, e]
            if conf >= thresh:
                cands.append((float(conf), (True, s, e)))
    chunks = [ck for _, ck in sorted(cands, reverse=True)]
    chunks = filter_clashed_by_priority(chunks, allow_nested=allow_nested)
    out = set()
    for _, s, e in chunks:
        score = scores[s, e]
        t = int(np.argmax(score))
        if score[t] >= thresh:
            out.add((id2label[t], s, e + 1, text[s : e + 1]))
    return out


# --------------------------------------------------------------------------
# M9: CasRel decode
# --------------------------------------------------------------------------
def casrel_decode(sub_starts, sub_ends, obj_cells_fn, l: int, text: str,
                  mapping, id2pred) -> set:
    """sub_starts/sub_ends: ascending token positions with sigmoid > 0.5.
    Subjects pair nearest end >= start; per subject, obj_cells_fn(span) ->
    (starts, ends) lists of (pos, pred_id); object pairing is nearest-end
    with matching predicate, scanning ends in (pos, pred) order and breaking
    at the first hit (modeling_casrel.py:157-245)."""
    subjects = []
    for s in sub_starts:
        if s == 0 or s > l - 2:
            continue
        later = [e for e in sub_ends if e >= s]
        if later:
            e = later[0]
            if e > l - 2:
                continue
            subjects.append((s, e))

    spoes = set()
    for subj in subjects:
        starts, ends = obj_cells_fn(subj)
        ends = sorted(ends)
        for _start, p1 in sorted(starts):
            if _start == 0 or _start > l - 2:
                continue
            for _end, p2 in ends:
                if _start <= _end <= l - 2 and p1 == p2:
                    s_h, s_t = mapping[subj[0]][0], mapping[subj[1]][1]
                    o_h, o_t = mapping[_start][0], mapping[_end][1]
                    spoes.add((id2pred[p1], text[s_h:s_t], text[o_h:o_t]))
                    break
    return spoes


# --------------------------------------------------------------------------
# M10: TPLinker RE decode
# --------------------------------------------------------------------------
def tplinker_re_decode(spots, l: int, text: str, mapping, id2label) -> set:
    """spots: [(p1, p2, label_id)] over the upper-tri shaking grid; labels
    are '<ent>=EH2ET' / '<rel>=SH2OH|OH2SH|ST2OT|OT2ST'
    (relation_extraction/tplinker/modeling_tplinker.py:149-243)."""
    head_ind2entities: dict = {}
    for p1, p2, lab in spots:
        tag = id2label[lab]
        ent_type, link_type = tag.split("=")
        if (link_type != "EH2ET" or p1 > p2 or 0 in (p1, p2)
                or p1 >= l - 1 or p2 >= l - 1):
            continue
        head_ind2entities.setdefault(p1, []).append(
            {"type": ent_type, "tok_span": [p1, p2]}
        )

    tail_links = set()
    for p1, p2, lab in spots:
        rel, link_type = id2label[lab].split("=")
        if link_type == "ST2OT":
            tail_links.add((rel, p1, p2))
        elif link_type == "OT2ST":
            tail_links.add((rel, p2, p1))

    spoes = set()
    for p1, p2, lab in spots:
        rel, link_type = id2label[lab].split("=")
        if link_type == "SH2OH":
            subj_head, obj_head = p1, p2
        elif link_type == "OH2SH":
            subj_head, obj_head = p2, p1
        else:
            continue
        if subj_head not in head_ind2entities or obj_head not in head_ind2entities:
            continue
        for subj in head_ind2entities[subj_head]:
            for obj in head_ind2entities[obj_head]:
                if (rel, subj["tok_span"][1], obj["tok_span"][1]) not in tail_links:
                    continue
                spoes.add(
                    (
                        rel,
                        text[mapping[subj["tok_span"][0]][0]: mapping[subj["tok_span"][1]][1]],
                        text[mapping[obj["tok_span"][0]][0]: mapping[obj["tok_span"][1]][1]],
                    )
                )
    return spoes


# --------------------------------------------------------------------------
# M11: GRTE decode (tag-algebra table)
# --------------------------------------------------------------------------
def grte_decode(cells: dict, l: int, text: str, mapping, id2pred) -> set:
    """cells: {(s_tok, e_tok, pred_id): tag} argmax grid (0 elsewhere),
    tag algebra 1=SS, 4/5=MSH/MST (multi-token obj), 2/3 (multi-token subj),
    6/7 (both multi) (modeling_grte.py:167-232). Scan order = row-major."""
    tmp = []
    for (s, e, r) in sorted(cells):
        if l - 1 <= s or l - 1 <= e or 0 in (s, e):
            continue
        tmp.append((s, e, r))

    def tag(s, e, r):
        return cells.get((s, e, r), 0)

    spoes = set()
    for s, e, r in tmp:
        t = tag(s, e, r)
        if t == 1:
            spoes.add((id2pred[r], text[mapping[s][0]:mapping[s][1]],
                       text[mapping[e][0]:mapping[e][1]]))
        elif t == 4:
            for s_, e_, r_ in tmp:
                if r == r_ and tag(s_, e_, r_) == 5 and s_ == s and e_ > e:
                    spoes.add((id2pred[r], text[mapping[s][0]:mapping[s][1]],
                               text[mapping[e][0]:mapping[e_][1]]))
                    break
        elif t == 6:
            for s_, e_, r_ in tmp:
                if r == r_ and tag(s_, e_, r_) == 7 and s_ > s and e_ > e:
                    spoes.add((id2pred[r], text[mapping[s][0]:mapping[s_][1]],
                               text[mapping[e][0]:mapping[e_][1]]))
                    break
        elif t == 2:
            for s_, e_, r_ in tmp:
                if r == r_ and tag(s_, e_, r_) == 3 and s_ > s and e_ == e:
                    spoes.add((id2pred[r], text[mapping[s][0]:mapping[s_][1]],
                               text[mapping[e][0]:mapping[e][1]]))
                    break
    return spoes


# --------------------------------------------------------------------------
# M12: OneRel decode
# --------------------------------------------------------------------------
def onerel_decode(cells: dict, l: int, text: str, mapping, id2pred) -> set:
    """cells: {(pred_id, h_tok, t_tok): tag} with tags 1=HB-TB, 2=HB-TE,
    3=HE-TE (modeling_onerel.py:145-187)."""
    hs: dict = {}
    hts: dict = {}
    ts: dict = {}
    for obj, tag in ((hs, 1), (hts, 2), (ts, 3)):
        for (p, h, t) in sorted(cells):
            if cells[(p, h, t)] != tag:
                continue
            if h >= l - 1 or t >= l - 1 or 0 in (h, t):
                continue
            obj.setdefault(p, []).append((h, t))

    spoes = set()
    for p in hs.keys() & ts.keys() & hts.keys():
        ht_list = hts[p]
        for sh, oh in hs[p]:
            for st, ot in ts[p]:
                if sh <= st and oh <= ot and (sh, ot) in ht_list:
                    spoes.add(
                        (
                            id2pred[p],
                            text[mapping[sh][0]:mapping[st][1]],
                            text[mapping[oh][0]:mapping[ot][1]],
                        )
                    )
    return spoes
