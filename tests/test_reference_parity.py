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
