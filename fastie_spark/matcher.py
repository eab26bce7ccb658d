"""Multi-pattern substring search (Aho-Corasick), pure python.

The dictionary scorer's hot loop is "find all (overlapping) occurrences of
every vocabulary surface in this chunk". Naively that is one str.find scan
per surface per grid family (entities + relation subjects/objects + event
arguments — the same text scanned hundreds of times per chunk). This
automaton finds ALL occurrences of ALL patterns in ONE pass; DictScorer
memoizes the result per chunk so every score view shares it.

Semantics identical to the find_all loops (all overlapping occurrences,
per pattern) — asserted by tests against the naive implementation.
"""

from __future__ import annotations

import re
from collections import deque


class MultiPatternMatcher:
    def __init__(self, patterns):
        # deduped, empty patterns dropped (find_all('', x) is [] upstream)
        self.patterns = sorted({p for p in patterns if p})
        # Fast path: when no pattern is a PREFIX of another, at most one
        # pattern can match at any start position, so a plain (lookahead-
        # free) alternation driven by re.search + restart-at(start+1)
        # enumerates exactly the same (pattern, start) set as the automaton
        # — and the C regex engine's first-char skip scan beats the
        # per-char Python trie walk (~1.5x measured on the bench vocab).
        # Prefix-containing sets (where the alternation would shadow the
        # longer pattern) keep the Aho-Corasick path.
        sp = self.patterns
        self._prefix_free = all(
            not sp[i + 1].startswith(sp[i]) for i in range(len(sp) - 1)
        )
        self._rx = (
            re.compile("|".join(map(re.escape, sp)))
            if self._prefix_free and sp else None
        )
        self._goto = [{}]  # node -> {char: node}
        self._out = [()]   # node -> tuple of pattern indices ending here
        self._fail = [0]
        for idx, pat in enumerate(self.patterns):
            node = 0
            for ch in pat:
                nxt = self._goto[node].get(ch)
                if nxt is None:
                    self._goto.append({})
                    self._out.append(())
                    self._fail.append(0)
                    nxt = len(self._goto) - 1
                    self._goto[node][ch] = nxt
                node = nxt
            self._out[node] = self._out[node] + (idx,)
        # BFS fail links + output merging
        q = deque()
        for child in self._goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self._goto[node].items():
                q.append(child)
                f = self._fail[node]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                self._fail[child] = self._goto[f].get(ch, 0)
                self._out[child] = self._out[child] + self._out[self._fail[child]]

    def occurrences(self, text: str) -> dict:
        """{pattern: [start, ...]} for every pattern with >= 1 occurrence
        (all overlapping occurrences, starts ascending)."""
        if self._rx is not None:
            # leftmost-search + restart at start+1 visits every match start;
            # prefix-freeness guarantees the single alternative matched at
            # each start is THE pattern occurring there
            res: dict = {}
            search = self._rx.search
            pos = 0
            while True:
                m = search(text, pos)
                if m is None:
                    return res
                s = m.start()
                res.setdefault(m.group(0), []).append(s)
                pos = s + 1
        goto, fail, out, pats = self._goto, self._fail, self._out, self.patterns
        res: dict = {}
        node = 0
        for i, ch in enumerate(text):
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                for pidx in out[node]:
                    p = pats[pidx]
                    res.setdefault(p, []).append(i - len(p) + 1)
        return res
