"""Pure numpy/python decode semantics, shared by the oracle and Spark UDFs.

Each function re-implements, from observed behavior, one reference decode
(file:line into /root/reference), over either a dense score grid (tests) or
the sparse cell sets produced by scorer.DictScorer (production — identical
results because the sparse fill NEG=-1.0 is below every decode threshold).

M1  gp_decode        .../global_pointer/modeling_gp.py:145-170
M2  w2ner_decode     .../w2ner/modeling_w2ner.py:197-254
M8  gplinker_decode  .../relation_extraction/gplinker/modeling_gplinker.py:164-213
M14 event_decode     .../event_extraction/gplinker/modeling_gplinker.py:157-221
M15 event_set2json   .../event_extraction/gplinker/decode_utils.py:76-100
    clique_search    .../event_extraction/gplinker/decode_utils.py:35-62
M16 get_span et al.  .../uie/decode_utils.py:38-115
"""

from __future__ import annotations

from itertools import groupby

import numpy as np

TRIGGER_ROLE = "触发词"


# --------------------------------------------------------------------------
# M1: GlobalPointer NER
# --------------------------------------------------------------------------
def gp_decode_cells(cells, l, text, mapping, id2label) -> set:
    """cells: iterable of (label_id, start_tok, end_tok) whose logit exceeds
    decode_thresh. Emits the reference's mention tuple set
    (label, char_start, char_end, surface); CLS/SEP/PAD cells excluded via
    ``s >= l-1 or e >= l-1 or 0 in (s, e)`` exactly as modeling_gp.py:163."""
    out = set()
    for label_id, s, e in cells:
        if s >= (l - 1) or e >= (l - 1) or 0 in (s, e):
            continue
        _start, _end = mapping[s][0], mapping[e][1]
        out.add((id2label[label_id], _start, _end, text[_start:_end]))
    return out


def gp_decode_dense(grid: np.ndarray, l, text, mapping, id2label, thresh=0.0) -> set:
    return gp_decode_cells(zip(*np.where(grid > thresh)), l, text, mapping, id2label)


# --------------------------------------------------------------------------
# M8: GPLinker relation extraction
# --------------------------------------------------------------------------
def gplinker_decode_cells(ent_cells, head_cells, tail_cells, l, text, mapping, id2pred) -> set:
    """Sparse GPLinker triple decode. ent_cells {(r,h,t)} (r=0 subject,
    else object); head_cells {(p,sh,oh)}; tail_cells {(p,st,ot)}. For every
    subject×object pair, emit predicates present in BOTH head and tail grids
    (modeling_gplinker.py:183-212)."""
    # triples only arise from (head ∩ tail) predicate sets, so an empty
    # head or tail grid decodes to nothing — skip the map building
    if not head_cells or not tail_cells:
        return set()
    subjects, objects = set(), set()
    for r, h, t in ent_cells:
        if h >= (l - 1) or t >= (l - 1) or 0 in (h, t):
            continue
        (subjects if r == 0 else objects).add((int(h), int(t)))

    head_map: dict = {}
    for p, sh, oh in head_cells:
        head_map.setdefault((sh, oh), set()).add(int(p))
    tail_map: dict = {}
    for p, st, ot in tail_cells:
        tail_map.setdefault((st, ot), set()).add(int(p))

    # iterate only (sh, oh) pairs PRESENT in the head grid instead of the
    # full subjects x objects product (output-identical: a pair absent from
    # head_map can never intersect to a predicate) — with the sparse scorer
    # the head grid is much smaller than the occurrence product
    subj_by_head: dict = {}
    for sh, st in subjects:
        subj_by_head.setdefault(sh, []).append(st)
    obj_by_head: dict = {}
    for oh, ot in objects:
        obj_by_head.setdefault(oh, []).append(ot)

    spoes = set()
    empty: set = set()
    for (sh, oh), ps_head in head_map.items():
        for st in subj_by_head.get(sh, ()):
            for ot in obj_by_head.get(oh, ()):
                ps = ps_head & tail_map.get((st, ot), empty)
                for p in ps:
                    spoes.add(
                        (
                            id2pred[p],
                            text[mapping[sh][0] : mapping[st][1]],
                            text[mapping[oh][0] : mapping[ot][1]],
                        )
                    )
    return spoes


def gplinker_decode_dense(
    entity_logits, head_logits, tail_logits, l, text, mapping, id2pred, thresh=0.0
) -> set:
    ent = set(zip(*np.where(entity_logits > thresh)))
    head = set(zip(*np.where(head_logits > thresh)))
    tail = set(zip(*np.where(tail_logits > thresh)))
    return gplinker_decode_cells(ent, head, tail, l, text, mapping, id2pred)


# --------------------------------------------------------------------------
# M14/M15: GPLinker event extraction + clique search + subset dedup
# --------------------------------------------------------------------------
class DedupList(list):
    """append-if-absent list (decode_utils.py:18-22)."""

    def append(self, x):  # noqa: A003
        if x not in self:
            super().append(x)


def neighbors(host, argus, links):
    results = [host]
    h2, h3 = host[2], host[3]
    for argu in argus:
        if (h2, h3, argu[2], argu[3]) in links:
            results.append(argu)
    return sorted(results)


class _OrderedSetList(list):
    """Order-preserving append-if-absent over hashable-projectable items —
    output-identical to DedupList (decode_utils.py:18-22), O(1) membership."""

    def __init__(self):
        super().__init__()
        self._seen = set()

    def append(self, x):  # noqa: A003
        key = tuple(map(tuple, x)) if x and isinstance(x[0], (list, tuple)) else tuple(x)
        if key not in self._seen:
            self._seen.add(key)
            super().append(x)


def clique_search_reference(argus, links):
    """Verbatim reference recursion (decode_utils.py:44-62), kept as the
    differential-test twin of the production clique_search below."""
    Argus = _OrderedSetList()
    for i1, (_, _, h1, t1) in enumerate(argus):
        for i2, (_, _, h2, t2) in enumerate(argus):
            if i2 > i1 and (h1, t1, h2, t2) not in links:
                Argus.append(neighbors(argus[i1], argus, links))
                Argus.append(neighbors(argus[i2], argus, links))
    if Argus:
        results = _OrderedSetList()
        for A in Argus:
            for a in clique_search_reference(A, links):
                results.append(a)
        return list(results)
    return [sorted(argus)]


_CLIQUE_SHAPE_MEMO: dict = {}  # (n, adjacency) -> result masks, process-wide


def clique_search(argus, links, max_states: int = 1 << 20):
    """Rewrite of the reference maximal-complete-subgraph recursion
    (decode_utils.py:44-62). Nodes become indices over the (set-derived,
    hence distinct) argu list, subsets become int bitmasks, and the
    recursion becomes an explicit post-order stack with memoization — the
    neighbor set and the non-adjacent-pair scan are word ops instead of
    O(n) list scans, and pathological link graphs can't blow the Python
    recursion limit.

    Output contract: identical to clique_search_reference up to WITHIN-
    clique node multiplicity — the reference appends a node twice when a
    self-position link (h,t,h,t) exists (two roles sharing one first
    occurrence); content sets and their order are identical, and the
    decoded events after event_set2json are bit-identical (arguments are
    DedupList'd). Both properties are pinned by the differential fuzz in
    tests/test_decoder_fuzz.py.

    Memory bound: the subset memo can grow exponentially on dense
    adversarial link graphs (the reference recursion has the same state
    space, spent as stack depth + repeated work instead). max_states caps
    the number of memoized subsets; exceeding it raises RuntimeError rather
    than exhausting worker memory. The default (2^20 states) comfortably
    covers every real event grid (n = distinct argument roles per
    doc x event_type, typically < 20)."""
    n = len(argus)
    if n <= 1:
        return [sorted(argus)]
    adj = [0] * n
    n_edges = 0
    for i in range(n):
        hi, ti = argus[i][2], argus[i][3]
        for j in range(i + 1, n):
            if (hi, ti, argus[j][2], argus[j][3]) in links:
                adj[i] |= 1 << j
                adj[j] |= 1 << i
                n_edges += 1
    return _clique_search_adj(argus, adj, n_edges, max_states)


def _clique_search_adj(argus, adj, n_edges, max_states: int = 1 << 20):
    """clique_search body over a PRE-BUILT adjacency bitmask list — used by
    event_decode_from_argus, whose link-confirmation pair scan already
    knows the adjacency, so re-deriving it from the links set would be
    duplicate O(n^2) work. Same output contract as clique_search."""
    n = len(argus)
    if n <= 1:
        return [sorted(argus)]
    full = (1 << n) - 1
    # complete graph (the common case: one event instance's arguments all
    # pairwise linked) — the recursion finds no non-adjacent pair and
    # returns the whole set; skip the stack machinery
    if n_edges == n * (n - 1) // 2:
        return [sorted(argus)]
    # the search result depends ONLY on the adjacency structure over node
    # indices (argus is pre-sorted by the caller), so identical small graph
    # shapes — which recur constantly across documents — share one memoized
    # mask list; the per-doc work collapses to adjacency build + mask->node
    # projection
    shape_key = (n, tuple(adj))
    masks = _CLIQUE_SHAPE_MEMO.get(shape_key)
    if masks is not None:
        return [
            sorted(argus[i] for i in range(n) if mask >> i & 1)
            for mask in masks
        ]

    expans: dict = {}  # sub -> ordered child masks (empty = sub is a clique)

    def expansions(sub):
        got = expans.get(sub)
        if got is not None:
            return got
        members = []
        m = sub
        while m:
            b = m & -m
            members.append(b.bit_length() - 1)
            m ^= b
        out, seen = [], set()
        for x, i in enumerate(members):
            # reference pair order: for each non-adjacent (i, j), append
            # neighbors(i) then neighbors(j), dedup by content
            for j in members[x + 1 :]:
                if not (adj[i] >> j) & 1:
                    for h in (i, j):
                        nb = (adj[h] & sub) | (1 << h)
                        if nb not in seen:
                            seen.add(nb)
                            out.append(nb)
        expans[sub] = out
        if len(expans) + len(memo) > max_states:
            raise RuntimeError(
                f"clique_search state explosion: >{max_states} subsets for "
                f"n={n} arguments — adversarially dense link graph; raise "
                f"max_states or pre-split the argument set"
            )
        return out

    memo: dict = {}
    stack = [full]
    while stack:
        sub = stack[-1]
        if sub in memo:
            stack.pop()
            continue
        children = expansions(sub)
        if not children:
            memo[sub] = [sub]
            stack.pop()
            continue
        pending = [c for c in children if c not in memo]
        if pending:
            stack.extend(pending)
            continue
        out, seen = [], set()
        for c in children:
            for r in memo[c]:
                if r not in seen:
                    seen.add(r)
                    out.append(r)
        memo[sub] = out
        stack.pop()

    if len(_CLIQUE_SHAPE_MEMO) < 65536:  # bound worker memory
        _CLIQUE_SHAPE_MEMO[shape_key] = memo[full]
    return [
        sorted(argus[i] for i in range(n) if mask >> i & 1)
        for mask in memo[full]
    ]


def event_decode_cells(
    argu_cells,
    head_links,
    tail_links,
    l,
    text,
    mapping,
    id2label,
    split="@",
    has_trigger=True,
) -> list:
    """Sparse event decode. argu_cells {(label_id,h,t)}; head_links/tail_links
    {(lo,hi)} = link-grid positive cells at [0, min, max]. Returns a list of
    events, each a list of (event_type, role, argument_text, start, end)
    (modeling_gplinker.py:177-221)."""
    argus = set()
    split_memo: dict = {}  # label id -> (etype, role), split once per call
    for p, h, t in argu_cells:
        if h >= (l - 1) or t >= (l - 1) or 0 in (h, t):
            continue
        er = split_memo.get(p)
        if er is None:
            er = split_memo[p] = tuple(id2label[p].rsplit(split, 1))
        argus.add((er[0], er[1], int(h), int(t)))
    return event_decode_from_argus(
        argus, head_links, tail_links, text, mapping, has_trigger=has_trigger
    )


def event_decode_from_argus(
    argus, head_links, tail_links, text, mapping, has_trigger=True
) -> list:
    """The grouping + clique + emission half of event_decode_cells, over an
    argu set already in decoded {(etype, role, h, t)} form — shared by the
    generic path above and the fused scorer fast path
    (DictScorer.event_views)."""
    # only positions that appear in some head/tail link pair can ever link
    # (the scorer links first occurrences only), so the O(n^2) pair scan
    # runs over that small subset instead of every occurrence — the link
    # set is identical. The scan is further restricted to WITHIN-event-type
    # pairs: clique_search only ever queries adjacency between arguments of
    # the same group, and for any within-group pair the link membership
    # test is determined by head_links/tail_links alone, so dropping the
    # cross-type pairs from the link set cannot change any adjacency.
    head_pos: set = set()
    for lo, hi in head_links:
        head_pos.add(lo)
        head_pos.add(hi)
    tail_pos: set = set()
    for lo, hi in tail_links:
        tail_pos.add(lo)
        tail_pos.add(hi)

    events = []
    for _, sub_argus in groupby(sorted(argus), key=lambda s: s[0]):
        group = list(sub_argus)
        # link-confirmation pair scan emits the adjacency BITMASKS directly
        # (by index into the sorted group) — clique_search would otherwise
        # re-derive the same adjacency from a links set with a second
        # O(n^2) scan. glist keeps (group index, h, t) of linkable members.
        glist = [
            (gi, a[2], a[3]) for gi, a in enumerate(group)
            if a[2] in head_pos and a[3] in tail_pos
        ]
        adj = [0] * len(group)
        n_edges = 0
        for x in range(len(glist)):
            g1, h1, t1 = glist[x]
            for y in range(x + 1, len(glist)):
                g2, h2, t2 = glist[y]
                if (min(h1, h2), max(h1, h2)) in head_links and (
                    min(t1, t2),
                    max(t1, t2),
                ) in tail_links:
                    adj[g1] |= 1 << g2
                    adj[g2] |= 1 << g1
                    n_edges += 1
        for event in _clique_search_adj(group, adj, n_edges):
            events.append([])
            for argu in event:
                start, end = mapping[argu[2]][0], mapping[argu[3]][1]
                events[-1].append((argu[0], argu[1], text[start:end], start, end))
            if has_trigger and all(a[1] != TRIGGER_ROLE for a in event):
                events.pop()
    return events


def event_isin(event_a, event_b) -> bool:
    """event_a ⊆ event_b (decode_utils.py:25-32)."""
    if event_a["event_type"] != event_b["event_type"]:
        return False
    return all(argu in event_b["arguments"] for argu in event_a["arguments"])


def event_set2json(events) -> list:
    """Subset-dedup'd event dicts (decode_utils.py:76-100)."""
    event_list = DedupList()
    for event in events:
        final_event = {"event_type": event[0][0], "arguments": DedupList()}
        for argu in event:
            _, role = argu[0], argu[1]
            if role != TRIGGER_ROLE:
                final_event["arguments"].append({"role": role, "argument": argu[2]})
            else:
                final_event["trigger"] = argu[2]
        event_list = [e for e in event_list if not event_isin(e, final_event)]
        if not any(event_isin(final_event, e) for e in event_list):
            event_list.append(final_event)
    return event_list


# --------------------------------------------------------------------------
# M2: W2NER
# --------------------------------------------------------------------------
def w2ner_decode_grid(grid: dict, length: int, text: str, id2label) -> set:
    """grid: sparse {(i, j): label} argmax grid (0 elsewhere); i, j are char
    indices. NNW (=1) at [i, j] i<j chains next-char links; THW (>1) at
    [tail, head] marks (head, tail, type). DFS from each head over NNW
    chains, emitting paths that end at a registered tail
    (modeling_w2ner.py:207-251). id2label includes the ["NONE","NNW"] prefix."""
    forward_dict: dict = {}
    head_dict: dict = {}
    ht_type_dict: dict = {}
    for (r, c), lab in grid.items():
        if r >= length or c >= length:
            continue
        if lab == 1 and r < c:
            forward_dict.setdefault(r, []).append(c)
        if lab > 1 and r >= c:
            ht_type_dict[(c, r)] = lab
            head_dict.setdefault(c, set()).add(r)
    for v in forward_dict.values():
        v.sort()

    predicts = []

    def find_entity(key, entity, tails):
        entity.append(key)
        if key in tails:
            predicts.append(entity.copy())
        if key in forward_dict:
            for k in forward_dict[key]:
                find_entity(k, entity, tails)
        entity.pop()

    for head in head_dict:
        find_entity(head, [], head_dict[head])

    entities = set()
    for ent in predicts:
        entities.add(
            (
                id2label[ht_type_dict[(ent[0], ent[-1])]],
                ent[0],
                ent[-1] + 1,
                "".join(text[i] for i in ent),
            )
        )
    return entities


# --------------------------------------------------------------------------
# M16 helpers: UIE span pairing
# --------------------------------------------------------------------------
def get_bool_ids_greater_than(probs, limit=0.5, return_prob=False):
    """Indices (optionally with probs) where prob > limit (decode_utils.py:90-115)."""
    probs = np.array(probs)
    if probs.ndim > 1:
        return [get_bool_ids_greater_than(p, limit, return_prob) for p in probs]
    result = []
    for i, p in enumerate(probs):
        if p > limit:
            result.append((i, p) if return_prob else i)
    return result


def get_span(start_ids, end_ids, with_prob=False) -> set:
    """Nearest start-end pairing without overlap (decode_utils.py:38-86)."""
    if with_prob:
        start_ids = sorted(start_ids, key=lambda x: x[0])
        end_ids = sorted(end_ids, key=lambda x: x[0])
    else:
        start_ids = sorted(start_ids)
        end_ids = sorted(end_ids)
    sp, ep = 0, 0
    couple_dict = {}
    while sp < len(start_ids) and ep < len(end_ids):
        s = start_ids[sp][0] if with_prob else start_ids[sp]
        e = end_ids[ep][0] if with_prob else end_ids[ep]
        if s == e:
            couple_dict[end_ids[ep]] = start_ids[sp]
            sp += 1
            ep += 1
        elif s < e:
            couple_dict[end_ids[ep]] = start_ids[sp]
            sp += 1
        else:
            ep += 1
    return {(couple_dict[end], end) for end in couple_dict}


def dbc2sbc(s: str) -> str:
    """Full-width -> half-width normalization (decode_utils.py:118-130)."""
    rs = ""
    for char in s:
        code = ord(char)
        if code == 0x3000:
            code = 0x0020
        else:
            code -= 0xFEE0
        if not (0x0021 <= code <= 0x7E):
            rs += char
            continue
        rs += chr(code)
    return rs
