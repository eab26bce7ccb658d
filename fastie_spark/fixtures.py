"""Deterministic synthetic corpus + vocab + linker fixtures (FIXTURES.md).

Everything is seeded (numpy PCG64) — no external data. The pages table has
exactly the input_hint shape ``(url string, warc_ts timestamp, html binary,
text string, lang string)``; html is a template wrap of text so the
html->text extraction stage has a byte-identical target. Head-entity skew is
injected with a Zipf draw over the entity vocabulary so the linking /
canonicalization stages exercise the skew path.

Gold outputs are NOT baked here: ground truth = OracleEngine run on the same
pages (oracle.py), which keeps the P/R gate meaningful (Spark vs reference
control flow), not circular vs the generator.
"""

from __future__ import annotations

import datetime as dt
import html as html_mod
import string

import numpy as np

from .decoders import dbc2sbc  # noqa: F401  (re-exported for linker fixtures)
from .scorer import Vocab

NER_LABELS = ["dis", "loc", "mis", "org", "per", "pro", "tim", "wrk"]
PREDICATES = [
    "author", "born_in", "capital_of", "ceo_of", "director", "founder",
    "located_in", "parent_org", "part_of", "product_of", "spouse", "works_for",
]
EVENT_TYPES = [
    ("org-layoff", ["time", "count", "company"]),
    ("org-founding", ["time", "founder", "company"]),
    ("fin-acquire", ["buyer", "target", "price"]),
]

_CJK_BASE = 0x4E00
_SYLLABLES = [
    "al", "bek", "cor", "dan", "el", "fir", "gor", "han", "il", "jor",
    "kam", "lin", "mor", "nel", "or", "pek", "qir", "ros", "sul", "tam",
    "ul", "vor", "wex", "yal", "zor",
]


def _latin_name(rng) -> str:
    k = int(rng.integers(2, 4))
    w = "".join(rng.choice(_SYLLABLES) for _ in range(k))
    return w.capitalize()


def _cjk_name(rng) -> str:
    k = int(rng.integers(2, 5))
    return "".join(chr(_CJK_BASE + int(rng.integers(0, 512))) for _ in range(k))


def build_vocab(seed: int = 42, n_entities: int = 120, n_relations: int = 90,
                n_event_instances: int = 24) -> Vocab:
    rng = np.random.default_rng(seed)
    surfaces: list[str] = []
    seen = set()
    while len(surfaces) < n_entities:
        s = _latin_name(rng) if rng.random() < 0.5 else _cjk_name(rng)
        # two-word latin names (contain a space) exercise the P3 masking path
        if rng.random() < 0.15 and s[0] in string.ascii_uppercase:
            s = s + " " + _latin_name(rng)
        if s not in seen and not any(s in t or t in s for t in seen):
            seen.add(s)
            surfaces.append(s)

    entity_vocab = [
        (s, NER_LABELS[int(rng.integers(0, len(NER_LABELS)))]) for s in surfaces
    ]

    # Zipf-weighted subject selection -> head entities for the skew path
    zipf_w = 1.0 / np.arange(1, n_entities + 1) ** 1.2
    zipf_w /= zipf_w.sum()
    relation_vocab = set()
    while len(relation_vocab) < n_relations:
        si = int(rng.choice(n_entities, p=zipf_w))
        oi = int(rng.integers(0, n_entities))
        if si == oi:
            continue
        p = PREDICATES[int(rng.integers(0, len(PREDICATES)))]
        relation_vocab.add((surfaces[si], p, surfaces[oi]))

    event_vocab = []
    for _ in range(n_event_instances):
        etype, roles = EVENT_TYPES[int(rng.integers(0, len(EVENT_TYPES)))]
        args = [("触发词", _cjk_name(rng))]
        for role in roles:
            if rng.random() < 0.8:
                args.append((role, surfaces[int(rng.integers(0, n_entities))]))
        event_vocab.append((etype, args))

    return Vocab(
        entity_vocab=entity_vocab,
        relation_vocab=sorted(relation_vocab),
        event_vocab=event_vocab,
    )


_FILLER = [
    "据相关报道显示，",
    "更多详细信息见下文。",
    "This page was archived from the public web. ",
    "以下内容来自公开网页快照。",
    "Nothing else is known at this time. ",
]


_BASE_TS = dt.datetime(2024, 10, 22, 0, 0, 0)


def build_page_row(vocab: Vocab, i: int, seed: int = 7,
                   p_long: float = 0.15) -> dict:
    """One deterministic page row, seeded per (seed, doc index) so
    generation is embarrassingly parallel (distributed synthesis in bench)."""
    rng = np.random.default_rng((seed, i))
    rels = vocab.relation_vocab
    ents = vocab.entity_vocab
    evs = vocab.event_vocab
    sents = []
    n_sent = int(rng.integers(2, 8))
    for _ in range(n_sent):
        r = rng.random()
        if r < 0.45 and rels:
            s, p, o = rels[int(rng.integers(0, len(rels)))]
            sents.append(f"{s}与{o}之间存在{p}关系。")
        elif r < 0.65 and ents:
            surf, lbl = ents[int(rng.integers(0, len(ents)))]
            sents.append(f"本文提到了{surf}这一{lbl}实体。")
        elif r < 0.75 and evs:
            etype, args = evs[int(rng.integers(0, len(evs)))]
            body = "，".join(f"{role}为{arg}" for role, arg in args)
            sents.append(f"发生{etype}事件：{body}。")
        else:
            sents.append(_FILLER[int(rng.integers(0, len(_FILLER)))])
    text = "".join(sents)
    if rng.random() < p_long:
        while len(text) <= 510:
            text = text + text
    text = text[:1500]
    url = f"https://example.org/doc/{i:08d}"
    lang = "zh" if rng.random() < 0.7 else "en"
    return {
        "url": url,
        "warc_ts": _BASE_TS + dt.timedelta(seconds=i),
        "html": wrap_html(text, url),
        "text": text,
        "lang": lang,
    }


def build_pages(vocab: Vocab, n_docs: int = 200, seed: int = 7,
                p_long: float = 0.15) -> list[dict]:
    """Synthesize the pages table rows. Text is sentence templates over the
    vocab so the dictionary scorer fires; some docs exceed 510 chars to
    exercise the chunk/rejoin path; latin sentences carry real spaces."""
    return [build_page_row(vocab, i, seed, p_long) for i in range(n_docs)]


_HTML_PRE = "<!DOCTYPE html><html><head><meta charset=\"utf-8\"><title>{url}</title></head><body><article>"
_HTML_POST = "</article></body></html>"


def wrap_html(text: str, url: str) -> bytes:
    return (
        _HTML_PRE.format(url=url) + html_mod.escape(text) + _HTML_POST
    ).encode("utf-8")


def build_linker_dict(vocab: Vocab) -> list[dict]:
    """alias -> canonical id rows (broadcast side of the linking join).
    Aliases: the surface itself, its full-width variant (inverse of dbc2sbc)
    and a lowercase variant for latin surfaces."""
    rows = []
    for idx, (surf, lbl) in enumerate(vocab.entity_vocab):
        cid = f"Q{idx:05d}"
        aliases = {surf}
        fw = "".join(
            chr(ord(c) + 0xFEE0) if 0x21 <= ord(c) <= 0x7E else c for c in surf
        )
        aliases.add(fw)
        if surf.lower() != surf:
            aliases.add(surf.lower())
        for a in sorted(aliases):
            rows.append(
                {"alias": a, "canonical_id": cid, "entity_type": lbl,
                 "prior": 1.0 if a == surf else 0.5}
            )
    return rows


def build_alias_edges(vocab: Vocab, seed: int = 13, cluster_max: int = 4) -> tuple:
    """(edges, expected_component) — canonical ids grouped into known
    clusters; edges chain each cluster so union-find output is assertable."""
    rng = np.random.default_rng(seed)
    n = len(vocab.entity_vocab)
    ids = [f"Q{i:05d}" for i in range(n)]
    order = rng.permutation(n)
    edges, expected = [], {}
    i = 0
    while i < n:
        k = int(rng.integers(1, cluster_max + 1))
        cluster = [ids[j] for j in order[i : i + k]]
        root = min(cluster)
        for cid in cluster:
            expected[cid] = root
        for a, b in zip(cluster, cluster[1:]):
            edges.append({"src": a, "dst": b})
        i += k
    return edges, expected
