"""One-off fixture generator for the doccano->UIE ETL differential test.

Runs the REFERENCE convert_ext_examples (exec'd from
/root/reference/fastie/data/uie/utils.py with tqdm/logger stubbed — no
code copied) at seed 1000 on the deterministic doc set shared with
tests/test_etl.py, and commits its output to
tests/fixtures/uie_etl_reference_output.json. The test suite then
compares convert_ext_examples_compat against the COMMITTED fixture, so no
external code is ever exec'd at test time (round-4 verdict item 7); the
source snapshot is sha256-pinned here so a swapped reference file fails
loudly at regeneration instead of silently refreshing the fixture.

Usage: python tools_gen_etl_fixture.py
"""

from __future__ import annotations

import hashlib
import json
import os
import random

REF_UTILS = "/root/reference/fastie/data/uie/utils.py"
REF_SHA256 = "2ac0af59d4278699c0e50d668821ea1f72202c26e43482f2678ef5717f4ac2fd"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tests", "fixtures", "uie_etl_reference_output.json")


def build_docs() -> list[dict]:
    """The SAME deterministic doc set tests/test_etl.py uses: many labels +
    few positives per doc => actual_ratio > negative_ratio, so
    random.sample fires in both stages; relations exercise
    redundants1/2/3 and the num_sup supplement path."""
    labels = [f"L{i}" for i in range(12)]
    docs = []
    for d in range(6):
        text = "".join(f"e{d}{j}" for j in range(4))
        ents = [
            {"id": j, "label": labels[(d * 3 + j) % 12],
             "start_offset": 3 * j, "end_offset": 3 * j + 3}
            for j in range(4)
        ]
        rels = []
        if d % 2 == 0:
            rels = [
                {"id": 100 + d, "from_id": 0, "to_id": 1, "type": "r_a"},
                {"id": 200 + d, "from_id": 2, "to_id": 3, "type": f"r_{d}"},
            ]
        docs.append({"text": text, "entities": ents, "relations": rels})
    return docs


def main() -> None:
    src = open(REF_UTILS).read()
    digest = hashlib.sha256(src.encode()).hexdigest()
    assert digest == REF_SHA256, (
        f"reference utils.py changed (sha256 {digest}) — re-audit before "
        "regenerating the fixture"
    )
    src = src.replace("from tqdm import tqdm", "")
    src = src.replace(
        "from ...extras import get_logger",
        "get_logger = lambda name: type('L', (), "
        "{'info': staticmethod(lambda *a, **k: None)})",
    )

    class _Tqdm:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def update(self, n=1):
            pass

    ns = {"__name__": "ref_uie_utils", "tqdm": _Tqdm}
    exec(src, ns)  # noqa: S102 - running the pinned read-only reference
    ref_convert = ns["convert_ext_examples"]

    docs = build_docs()
    raw_lines = [json.dumps(doc, ensure_ascii=False) for doc in docs]
    random.seed(1000)  # what transformers set_seed(1000) does to `random`
    ref_ent, ref_rel, ref_cls = ref_convert(raw_lines, negative_ratio=3)
    assert ref_cls == []

    with open(OUT, "w") as f:
        json.dump(
            {"source_sha256": REF_SHA256, "seed": 1000, "negative_ratio": 3,
             "entity_examples": ref_ent, "relation_examples": ref_rel},
            f, ensure_ascii=False, indent=1,
        )
    print(f"wrote {OUT}: {len(ref_ent)} entity / {len(ref_rel)} relation "
          "examples")


if __name__ == "__main__":
    main()
