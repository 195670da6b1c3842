"""Direct output parity against the REAL reference binaries.

Builds the reference (Phoenix++ + lab apps) from its own sources in a
scratch dir (skipped if the toolchain or sources are absent), runs
``wordCount``/``top50`` on Dracula.txt, and compares their printed
(word, count) sets against our parity-mode pipelines on the same file.

Both reference sort orders are total (count then descending strcmp),
so exact sequence comparison is valid for top50; wordCount is compared
as a set to stay robust to its threaded merge.
"""

import os
import re
import shutil
import subprocess

import pytest

REF_SRC = "/root/reference/phoenixLab"
BUILD_DIR = "/tmp/phoenix_parity_build"
LINE_RE = re.compile(r"^\s*([a-z']+) - (\d+)$")


def _build() -> str | None:
    if not os.path.isdir(REF_SRC) or shutil.which("g++") is None:
        return None
    wc = os.path.join(BUILD_DIR, "wordCount", "wordCount")
    if not os.path.exists(wc):
        shutil.rmtree(BUILD_DIR, ignore_errors=True)
        shutil.copytree(REF_SRC, BUILD_DIR)
        r = subprocess.run(
            ["make"], cwd=BUILD_DIR, capture_output=True, timeout=300
        )
        if r.returncode != 0 or not os.path.exists(wc):
            return None
    return BUILD_DIR


def _run_ref(build: str, app: str, *args: str) -> list[tuple[str, int]]:
    exe = os.path.join(build, app, app)
    env = dict(os.environ, MR_NUMTHREADS="4")
    # cwd MUST be the project root: the apps open "Stop_Words.txt"
    # relative to the CWD (wordCount.cpp:123) — run from elsewhere and
    # the stop list silently loads empty (README runs them from root)
    out = subprocess.run(
        [exe, *args], capture_output=True, text=True, timeout=300, env=env,
        cwd=build,
    ).stdout
    pairs = []
    for line in out.splitlines():
        m = LINE_RE.match(line)
        if m:
            pairs.append((m.group(1), int(m.group(2))))
    return pairs


@pytest.fixture(scope="module")
def ref_build():
    b = _build()
    if b is None:
        pytest.skip("reference sources or g++ unavailable")
    return b


def test_wordcount_matches_reference_binary(spark, ref_build):
    from lab3_spark.operators.wordcount import word_count
    from lab3_spark.sources.text import read_text_lines

    ref = _run_ref(ref_build, "wordCount", os.path.join(ref_build, "Dracula.txt"))
    assert len(ref) > 5000  # full vocabulary printed
    ours = {
        (r["word"], r["cnt"])
        for r in word_count(
            read_text_lines(spark, os.path.join(ref_build, "Dracula.txt")),
            mode="parity",
        ).collect()
    }
    assert set(ref) == ours, (
        f"only_ref={sorted(set(ref) - ours)[:10]} "
        f"only_ours={sorted(ours - set(ref))[:10]}"
    )


def test_top50_matches_reference_binary(spark, ref_build):
    from lab3_spark.operators.topk import top_k_words
    from lab3_spark.sources.text import read_text_lines

    ref = _run_ref(
        ref_build, "top50", os.path.join(ref_build, "Dracula.txt"), "50"
    )
    assert len(ref) == 50
    ours = [
        (r["word"], r["cnt"])
        for r in top_k_words(
            read_text_lines(spark, os.path.join(ref_build, "Dracula.txt")),
            k=50,
            mode="parity",
        ).collect()
    ]
    # both orders are total (cnt desc, word desc) → exact sequence
    assert ref == ours


# the final printed group has NO trailing newline (the "\n" is emitted
# by the NEXT transition, which never comes), so the binary's last index
# line is concatenated with the "completed map reduce" log line
INVERT_RE = re.compile(
    r"^\s*([a-z']+) - (\d+(?:, \d+)*)(?:completed map reduce)?$"
)


def test_invert_matches_reference_binary(spark, ref_build):
    """invert's print loop (invert.cpp:151-167) swallows the first ROW
    of each word group at the transition (the `else` branch prints only
    "\n") — so a single-occurrence word vanishes, a multi-occurrence
    word loses its first occurrence, AND a vanished group leaves
    firstTime=true so the NEXT group prints fully.  We simulate that
    exact state machine over word groups in first-occurrence order
    (pointer order, deterministic with MR_NUMTHREADS=1) from our token
    positions, and require the binary's output to match word-for-word,
    set-for-set."""
    from pyspark.sql import functions as F

    from lab3_spark.functions.text import is_stop_word, tokenize
    from lab3_spark.sources.text import read_text_lines

    exe = os.path.join(ref_build, "invert", "invert")
    env = dict(os.environ, MR_NUMTHREADS="1")
    out = subprocess.run(
        [exe, os.path.join(ref_build, "Dracula.txt")],
        capture_output=True, text=True, timeout=300, env=env, cwd=ref_build,
    ).stdout
    ref: dict[str, set[int]] = {}
    for line in out.splitlines():
        m = INVERT_RE.match(line)
        if m:
            ref.setdefault(m.group(1), set()).update(
                int(v) for v in m.group(2).split(", ")
            )
    assert len(ref) > 4000

    # our data: every occurrence with (line, position-in-line)
    lines = read_text_lines(spark, os.path.join(ref_build, "Dracula.txt"))
    occ = (
        lines.select(
            "line_no", F.posexplode(tokenize("text")).alias("pos", "word")
        )
        .where(~is_stop_word("word", "parity"))
        .collect()
    )
    per_word: dict[str, list[int]] = {}
    first_pos: dict[str, tuple[int, int]] = {}
    for r in sorted(occ, key=lambda r: (r["line_no"], r["pos"])):
        w = r["word"]
        per_word.setdefault(w, []).append(r["line_no"])
        first_pos.setdefault(w, (r["line_no"], r["pos"]))

    # simulate the print loop over groups in first-occurrence order
    expected: dict[str, set[int]] = {}
    first_time = True
    for w in sorted(per_word, key=lambda w: first_pos[w]):
        vals = per_word[w]  # occurrence rows in buffer (occurrence) order
        if first_time:
            expected[w] = set(vals)
            first_time = False
        else:
            # transition consumes vals[0] and prints "\n"
            rest = vals[1:]
            if not rest:
                first_time = True  # group vanished; next prints fully
            else:
                expected[w] = set(rest)
                first_time = False

    assert set(ref) == set(expected), (
        f"only_ref={sorted(set(ref) - set(expected))[:10]} "
        f"only_expected={sorted(set(expected) - set(ref))[:10]}"
    )
    bad = [w for w in ref if ref[w] != expected[w]]
    assert not bad, (
        bad[:5],
        {w: (sorted(ref[w])[:5], sorted(expected[w])[:5]) for w in bad[:2]},
    )
