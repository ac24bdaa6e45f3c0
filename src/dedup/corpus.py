"""Deterministic synthetic source-code corpus with planted clone classes.

Implements FIXTURES.md section 1: `code_files(repo, path, commit, lang, content)`
plus a truth side-table `(repo, path, commit, truth_cluster_id, clone_type)`
(doc_id is assigned later in Spark as xxhash64(repo, path, commit), so the
truth table is keyed by the natural key here and joined in Spark).

Clone classes (ratios from FIXTURES.md):
- exact       ~10%  byte-identical copies under different (repo, path, commit)
- type2       ~10%  identifier-renamed + comment/whitespace-edited (J >= ~0.85)
- type3       ~5%   one block inserted/deleted/moved (J in ~0.6..0.85)
- boilerplate ~2%   one license-header-style hot-key family (LSH skew stressor)
- unique      rest  singletons

All randomness flows from one seed. The generator is the test fixture for
recall/precision assertions — the analogue of the reference's instrumented
TestProcess fixtures (reference: src/it/scala/deduplication/TestUtils.scala:19-52).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import pandas as pd

_LANGS = ["python", "scala", "java", "go", "javascript"]
_EXT = {"python": "py", "scala": "scala", "java": "java", "go": "go", "javascript": "js"}
_KEYWORDS = {
    "python": ["def", "return", "if", "else", "for", "in", "import", "class", "while"],
    "scala": ["def", "val", "var", "if", "else", "match", "case", "object", "class"],
    "java": ["public", "private", "void", "int", "return", "if", "else", "class", "new"],
    "go": ["func", "return", "if", "else", "for", "range", "var", "type", "struct"],
    "javascript": ["function", "return", "if", "else", "for", "const", "let", "class"],
}
_WORDS = [
    "count", "index", "value", "total", "result", "buffer", "offset", "size",
    "key", "node", "item", "queue", "stack", "cache", "batch", "chunk", "page",
    "user", "order", "price", "score", "rate", "flag", "state", "config", "path",
]


def _ident(rng: random.Random, vocab: list[str]) -> str:
    return rng.choice(vocab)


def _make_vocab(rng: random.Random, size: int = 240) -> list[str]:
    """Per-repo identifier vocabulary. Size and numeric-suffix range are
    chosen so that two UNRELATED files share few 9-char shingles even when
    long: with a small vocab, same-grammar documents converge to a constant
    Jaccard as length grows and flood LSH with noise candidates (measured:
    3x-longer files at 40-identifier vocab produced millions of candidate
    pairs). Clone variants copy base content verbatim, so planted-pair
    similarity is unaffected."""
    out = []
    for _ in range(size):
        a, b = rng.choice(_WORDS), rng.choice(_WORDS)
        out.append(f"{a}_{b}{rng.randrange(100000)}")
    return out


def _gen_line(rng: random.Random, lang: str, vocab: list[str]) -> str:
    kw = _KEYWORDS[lang]
    kind = rng.random()
    if kind < 0.12:
        return f"# {' '.join(rng.choice(_WORDS) for _ in range(rng.randrange(3, 8)))}"
    if kind < 0.30:
        return f"{rng.choice(kw)} {_ident(rng, vocab)}({_ident(rng, vocab)}, {_ident(rng, vocab)}):"
    if kind < 0.55:
        op = rng.choice(["+", "-", "*", "%", "//"])
        return f"    {_ident(rng, vocab)} = {_ident(rng, vocab)} {op} {rng.randrange(1000000)}"
    if kind < 0.72:
        return f"    {rng.choice(kw)} {_ident(rng, vocab)} {rng.choice(['<', '>', '==', '!='])} {rng.randrange(100000)}:"
    if kind < 0.86:
        return f"        {rng.choice(kw)} {_ident(rng, vocab)}.{_ident(rng, vocab)}({rng.randrange(50000)})"
    return f"    {_ident(rng, vocab)}[{rng.randrange(20)}] = \"{rng.choice(_WORDS)}-{rng.randrange(1000000)}\""


def _gen_file(rng: random.Random, lang: str, vocab: list[str], n_lines: int) -> str:
    return "\n".join(_gen_line(rng, lang, vocab) for _ in range(n_lines)) + "\n"


def _type2_variant(rng: random.Random, content: str, vocab: list[str]) -> str:
    """Rename a couple of identifiers (consistent), tweak comments/whitespace.
    Keeps char-9-shingle Jaccard >= ~0.85."""
    lines = content.split("\n")
    # pick 2 identifiers actually present and rename them corpus-wide
    present = [w for w in vocab if any(w in ln for ln in lines)]
    rng.shuffle(present)
    mapping = {}
    for old in present[:2]:
        mapping[old] = old.rsplit("_", 1)[0] + f"_r{rng.randrange(100)}"
    out = []
    for ln in lines:
        for old, new in mapping.items():
            ln = ln.replace(old, new)
        if ln.startswith("# ") and rng.random() < 0.3:
            ln = f"# {rng.choice(_WORDS)} {rng.choice(_WORDS)}"
        out.append(ln)
    if rng.random() < 0.5:
        out.append("")  # trailing whitespace edit
    return "\n".join(out)


def _type3_variant(rng: random.Random, content: str, lang: str, vocab: list[str]) -> str:
    """Insert/delete/move one block of lines. Jaccard lands in ~0.6..0.85."""
    lines = content.split("\n")
    n = len(lines)
    block = max(3, n // 5)
    action = rng.choice(["insert", "delete", "move"])
    if action == "insert" or n <= 2 * block:
        pos = rng.randrange(max(1, n - 1))
        new_block = [_gen_line(rng, lang, vocab) for _ in range(block)]
        lines = lines[:pos] + new_block + lines[pos:]
    elif action == "delete":
        pos = rng.randrange(n - block)
        lines = lines[:pos] + lines[pos + block:]
    else:  # move
        pos = rng.randrange(n - block)
        chunk = lines[pos:pos + block]
        rest = lines[:pos] + lines[pos + block:]
        dest = rng.randrange(len(rest))
        lines = rest[:dest] + chunk + rest[dest:]
    return "\n".join(lines)


_BOILERPLATE_BASE = (
    "# Licensed under the Apache License, Version 2.0 (the \"License\");\n"
    "# you may not use this file except in compliance with the License.\n"
    "# You may obtain a copy of the License at\n"
    "#     http://www.apache.org/licenses/LICENSE-2.0\n"
    "# Unless required by applicable law or agreed to in writing, software\n"
    "# distributed under the License is distributed on an \"AS IS\" BASIS,\n"
    "# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.\n"
    "# See the License for the specific language governing permissions and\n"
    "# limitations under the License.\n"
    "from .core import *  # noqa\n"
    "__all__ = []\n"
)


@dataclass
class Corpus:
    files: pd.DataFrame   # repo, path, commit, lang, content
    truth: pd.DataFrame   # repo, path, commit, truth_cluster_id, clone_type

    @property
    def truth_pairs(self) -> set[tuple[str, str]]:
        """Set of unordered natural-key pairs that are true duplicates
        (within a truth cluster of size >= 2, excluding 'unique')."""
        pairs: set[tuple[str, str]] = set()
        key = (self.truth.repo + "//" + self.truth.path + "//" + self.truth.commit)
        df = pd.DataFrame({"k": key, "c": self.truth.truth_cluster_id,
                           "t": self.truth.clone_type})
        for _, grp in df[df.t != "unique"].groupby("c"):
            ks = sorted(grp.k)
            for i in range(len(ks)):
                for j in range(i + 1, len(ks)):
                    pairs.add((ks[i], ks[j]))
        return pairs


def generate_corpus(n_rows: int = 2000, seed: int = 42,
                    boilerplate_members: int | None = None,
                    line_scale: float = 1.0) -> Corpus:
    """line_scale multiplies per-file line counts (content stays capped at
    8000 chars): scaling benchmarks raise it to grow per-file compute without
    changing the pair structure of the corpus."""
    rng = random.Random(seed)
    n_exact = int(n_rows * 0.10)
    n_type2 = int(n_rows * 0.10)
    n_type3 = int(n_rows * 0.05)
    n_boiler = boilerplate_members or max(50, int(n_rows * 0.02))

    vocabs = {r: _make_vocab(random.Random(seed * 1000 + r)) for r in range(7)}

    rows: list[dict] = []
    truth: list[dict] = []
    cluster_seq = 0
    file_seq = 0

    def emit(content: str, lang: str, cluster: int, ctype: str) -> None:
        nonlocal file_seq
        i = file_seq
        file_seq += 1
        repo_n = i % 7
        repo = f"org{repo_n}/repo{i % 53}"
        name = f"{rng.choice(_WORDS)}{i}"
        path = f"src/{rng.choice(_WORDS)}/{name}.{_EXT[lang]}"
        commit = "".join(rng.choice("0123456789abcdef") for _ in range(40))
        rows.append(dict(repo=repo, path=path, commit=commit, lang=lang,
                         content=content))
        truth.append(dict(repo=repo, path=path, commit=commit,
                          truth_cluster_id=cluster, clone_type=ctype))

    def new_base(min_lines: int = 8, max_lines: int = 80) -> tuple[str, str, list[str]]:
        lang = rng.choice(_LANGS)
        vocab = vocabs[rng.randrange(7)]
        n_lines = rng.randrange(
            max(2, int(min_lines * line_scale)), int(max_lines * line_scale) + 2
        )
        content = _gen_file(rng, lang, vocab, n_lines)
        # clamp to FIXTURES length band 200..8000 chars
        while len(content) < 200:
            content += _gen_line(rng, lang, vocab) + "\n"
        return content[:8000], lang, vocab

    # --- exact clone groups ---
    emitted = 0
    while emitted < n_exact:
        size = min(rng.randrange(2, 6), n_exact - emitted)
        if size < 2:
            size = 2
        content, lang, _ = new_base()
        cluster_seq += 1
        for _ in range(size):
            emit(content, lang, cluster_seq, "exact")
        emitted += size

    # --- type2 groups (base + renamed variants) ---
    emitted = 0
    while emitted < n_type2:
        size = min(rng.randrange(2, 4), max(2, n_type2 - emitted))
        content, lang, vocab = new_base(min_lines=15)
        cluster_seq += 1
        emit(content, lang, cluster_seq, "type2")
        for _ in range(size - 1):
            emit(_type2_variant(rng, content, vocab), lang, cluster_seq, "type2")
        emitted += size

    # --- type3 groups ---
    emitted = 0
    while emitted < n_type3:
        size = 2
        content, lang, vocab = new_base(min_lines=20)
        cluster_seq += 1
        emit(content, lang, cluster_seq, "type3")
        emit(_type3_variant(rng, content, lang, vocab), lang, cluster_seq, "type3")
        emitted += size

    # --- boilerplate hot-key family (LSH skew stressor) ---
    cluster_seq += 1
    for m in range(n_boiler):
        content = _BOILERPLATE_BASE + f"# module {m % 17}\n"
        emit(content, "python", cluster_seq, "boilerplate")

    # --- unique singletons (fill to exactly n_rows) ---
    n_unique = max(0, n_rows - file_seq)
    for _ in range(n_unique):
        content, lang, _ = new_base()
        cluster_seq += 1
        emit(content, lang, cluster_seq, "unique")

    files = pd.DataFrame(rows)
    truth_df = pd.DataFrame(truth)
    return Corpus(files=files, truth=truth_df)
