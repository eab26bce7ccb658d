"""Long-document chunking semantics (SURVEY.md §2.2 P5/P6).

Re-implements, from its observable behavior, the reference's
``cut_chinese_sent`` (/root/reference/fastie/models/named_entity_recognition/
global_pointer/decode_utils.py:57-67) and ``auto_splitter`` (ibid. :70-106):

- sentence split on 。！？? / ``......`` / ``……`` keeping closing quotes
  attached;
- fixed-window split of any sentence longer than ``max_text_len`` into
  consecutive ``max_text_len``-char slices;
- chunk-rejoin offset algebra: a chunk's mention offsets are shifted by the
  *cumulative character length of all previous chunks of the same document*
  (``_auto_joiner`` ibid. :208-229 — shift by chunk string length, not token
  count).

These functions are pure Python and shared by the oracle; the Spark pipeline
expresses the same fixed-window (split_sentence=False) chunking relationally
(sequence + substring + posexplode) so Catalyst handles it without a UDF.
"""

from __future__ import annotations

import math
import re

_SENT_PAT_1 = re.compile(r"([。！？\?])([^”’])")
_SENT_PAT_2 = re.compile(r"(\.{6})([^”’])")
_SENT_PAT_3 = re.compile(r"(\…{2})([^”’])")
_SENT_PAT_4 = re.compile(r"([。！？\?][”’])([^，。！？\?])")


def cut_chinese_sent(para: str) -> list[str]:
    """Sentence split keeping quote-closers attached (P5)."""
    para = _SENT_PAT_1.sub(r"\1\n\2", para)
    para = _SENT_PAT_2.sub(r"\1\n\2", para)
    para = _SENT_PAT_3.sub(r"\1\n\2", para)
    para = _SENT_PAT_4.sub(r"\1\n\2", para)
    para = para.rstrip()
    return para.split("\n")


def auto_splitter(
    input_texts: list[str], max_text_len: int, split_sentence: bool = False
) -> tuple[list[str], dict[int, list[int]]]:
    """Split raw texts into <= max_text_len chunks; return chunks + doc->chunk map (P6)."""
    input_mapping: dict[int, list[int]] = {}
    short_input_texts: list[str] = []
    cnt_short = 0
    for cnt_org, text in enumerate(input_texts):
        sens = cut_chinese_sent(text) if split_sentence else [text]
        for sen in sens:
            lens = len(sen)
            if lens <= max_text_len:
                short_input_texts.append(sen)
                input_mapping.setdefault(cnt_org, []).append(cnt_short)
                cnt_short += 1
            else:
                pieces = [sen[i : i + max_text_len] for i in range(0, lens, max_text_len)]
                short_input_texts.extend(pieces)
                short_idx = cnt_short
                cnt_short += math.ceil(lens / max_text_len)
                input_mapping.setdefault(cnt_org, []).extend(
                    range(short_idx, cnt_short)
                )
    return short_input_texts, input_mapping


def split_one(text: str, max_text_len: int) -> list[str]:
    """Fixed-window chunks of a single doc (split_sentence=False path)."""
    if len(text) <= max_text_len:
        return [text]
    return [text[i : i + max_text_len] for i in range(0, len(text), max_text_len)]


def char_bases(chunks: list[str]) -> list[int]:
    """Cumulative char offset of each chunk (the J1 rejoin shift)."""
    bases, acc = [], 0
    for c in chunks:
        bases.append(acc)
        acc += len(c)
    return bases


def mask_spaces(text: str) -> str:
    """P3 space masking: offsets survive tokenization (decode_utils.py:138)."""
    return text.replace(" ", "-")
