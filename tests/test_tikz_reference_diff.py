"""Differential compile-layer conformance vs the ACTUAL reference parser.

The reference's error-log parsing (``TikzDocument.errors``, reference
tikz.py:54-73) and engine-chain selection (tikz.py:111-131) are pure
Python: this test runs the reference code itself on a corpus of varied /
fuzzed latexmk-style logs and asserts our ``parse_errors`` /
``select_best_attempt`` produce identical {line: msg} maps and identical
engine choices. Any divergence -- rootfile detection, other-file
collapse-to-0, last-message-wins overwrites, greedy-regex ambiguities,
first-in-log ranking -- fails here (VERDICT round-2 directive #3).
"""
import random
import re
from subprocess import CalledProcessError, TimeoutExpired

import pytest

from reference_loader import load_reference

load_reference()

import detikzify.infer.tikz as ref_tikz  # noqa: E402

from detikzify_tpu.infer.tikz import (FATAL_ERROR_MSG, parse_errors,  # noqa: E402
                                      select_best_attempt)

ROOT = "/tmp/diffbuild/tmpw3k9q2"   # extensionless like the reference's
                                    # NamedTemporaryFile root document


def ref_parse(log: str) -> dict:
    """Run the reference's own ``errors`` property on ``log``."""
    doc = ref_tikz.TikzDocument.__new__(ref_tikz.TikzDocument)
    doc.code = "x"
    doc.timeout = 1
    doc.compile = lambda: ref_tikz.TikzDocument.Output(
        pdf=None, status=1, log=log)
    return doc.errors


def our_parse(log: str) -> dict:
    """Our parse + the TikzDocument-level fatal fallback (status != 0)."""
    return parse_errors(log) or {0: FATAL_ERROR_MSG}


# ---------------------------------------------------------------------------
# corpus: structured cases + seeded fuzz (>= 50 logs total)
# ---------------------------------------------------------------------------

STRUCTURED = [
    # plain single error in the root file
    f"This is pdfTeX\n({ROOT}\n{ROOT}:12: Undefined control sequence.\n",
    # multiple root errors, ascending
    f"({ROOT}\n{ROOT}:3: Missing $ inserted.\n{ROOT}:30: Extra }}.\n",
    # multiple errors on the SAME line: last message wins
    f"({ROOT}\n{ROOT}:7: first.\n{ROOT}:7: second.\n",
    # error in another file -> line 0
    f"({ROOT}\n/usr/share/texmf/pgf/tikz.sty:88: Package pgf Error.\n",
    # mixed root + other-file errors
    f"({ROOT}\n/x/a.sty:1: sty problem.\n{ROOT}:9: root problem.\n"
    f"/x/b.cls:2: cls problem.\n",
    # no rootfile line at all: everything unlocatable
    f"{ROOT}:5: orphan error.\n",
    # no errors, warnings only
    f"({ROOT}\nOverfull \\hbox (3.2pt too wide) in paragraph at lines "
    f"5--6\nLaTeX Warning: Reference undefined.\n",
    # completely empty log
    "",
    # bang-style error without file:line (unlocatable -> fatal fallback)
    f"({ROOT}\n! Emergency stop.\n<*> {ROOT}\n",
    # rootfile line with trailing junk: captured rootfile never matches
    f"({ROOT} (/usr/share/texmf/article.cls\n{ROOT}:4: error anyway.\n",
    # message containing colons and digits
    f"({ROOT}\n{ROOT}:10: Paragraph ended before \\x was complete: 3.\n",
    # ambiguous colon-number-colon inside the message (greedy regex)
    f"({ROOT}\n{ROOT}:12:34: strange ratio.\n",
    # windows-style path with a drive colon in another file
    f"({ROOT}\nC:/texmf/x.sty:5: drive-letter error.\n",
    # message that strips to empty
    f"({ROOT}\n{ROOT}:6: \n",
    # nested file opens then a root error
    f"({ROOT}\n(/usr/share/texlive/standalone.cls\n"
    f"(/usr/share/texlive/tikz.code.tex))\n{ROOT}:21: Missing \\endcsname."
    f"\n",
    # error line number 0 explicitly printed
    f"({ROOT}\n{ROOT}:0: weird zero-line error.\n",
    # huge line number
    f"({ROOT}\n{ROOT}:99999: far away.\n",
]


def _fuzz_logs(n: int = 50):
    rng = random.Random(0xD1F)
    other_files = ["/t/x.sty", "./local.tex", "C:/t/w.cls", "/a/b/c.code.tex"]
    msgs = ["Undefined control sequence.", "Missing $ inserted.",
            "Too many }'s.", "err: 12:7 odd.", "x", " padded  ",
            "Package tikz Error: I do not know the key '/tikz/foo'."]
    fillers = ["This is pdfTeX, Version 3.14", "entering extended mode",
               "LaTeX2e <2023-06-01>", "l.12 \\draw (0,0)",
               "Overfull \\vbox (1.1pt too high) detected",
               "[1{/var/fonts/pdftex.map}]", "(see the transcript file)",
               "*geometry* driver: auto-detecting", "))", "<*> x.tex"]
    logs = []
    for _ in range(n):
        lines = []
        if rng.random() < 0.8:
            lines.append(f"({ROOT}")
        for _ in range(rng.randrange(0, 10)):
            r = rng.random()
            if r < 0.35:
                lines.append(f"{ROOT}:{rng.randrange(0, 60)}: "
                             f"{rng.choice(msgs)}")
            elif r < 0.5:
                lines.append(f"{rng.choice(other_files)}:"
                             f"{rng.randrange(1, 40)}: {rng.choice(msgs)}")
            elif r < 0.6 and lines:
                # duplicate an earlier line (same-line overwrite paths)
                lines.append(rng.choice(lines))
            else:
                lines.append(rng.choice(fillers))
        tail = lines[1:]
        rng.shuffle(tail)
        lines[1:] = tail
        logs.append("\n".join(lines) + "\n")
    return logs


CORPUS = STRUCTURED + _fuzz_logs(50)


def test_corpus_is_large_and_varied():
    assert len(CORPUS) >= 50
    # the corpus must exercise root errors, other-file errors, and logs
    # with no parseable error at all
    assert sum(f"{ROOT}:" in log for log in CORPUS) > 20
    assert sum(".sty:" in log or ".cls:" in log for log in CORPUS) > 5
    assert sum(not our_parse(log) or our_parse(log) == {0: FATAL_ERROR_MSG}
               for log in CORPUS) > 3


@pytest.mark.parametrize("i", range(len(CORPUS)))
def test_parse_matches_reference(i):
    log = CORPUS[i]
    assert our_parse(log) == ref_parse(log), f"divergence on log:\n{log}"


# ---------------------------------------------------------------------------
# engine-chain selection differential: drive the reference's actual
# compile() loop with a monkeypatched latexmk
# ---------------------------------------------------------------------------

def ref_select(attempts):
    """Run reference ``TikzDocument.compile`` (tikz.py:89-131) with latexmk
    replaced by canned per-engine outcomes; return the index of the attempt
    whose log the reference kept (identified by a marker line)."""
    calls = {"i": 0}

    def fake_check_output(*, cwd, timeout, stderr, env, args):
        i = calls["i"]
        calls["i"] += 1
        rc, log = attempts[i]
        root = args[-1]       # the real NamedTemporaryFile path
        log = log.replace(ROOT, root) + f"\n%%MARKER{i}%%\n"
        if rc == 0:
            return b""
        if rc == -1:
            raise TimeoutExpired(args, timeout, output=log.encode())
        raise CalledProcessError(rc, args, output=log.encode())

    orig = ref_tikz.check_output
    orig_engines = ref_tikz.TikzDocument.engines
    ref_tikz.check_output = fake_check_output
    # one fake engine per canned attempt
    ref_tikz.TikzDocument.engines = [f"engine{j}"
                                     for j in range(len(attempts))]
    try:
        doc = ref_tikz.TikzDocument("x", timeout=1)
        out = doc.compile()
    finally:
        ref_tikz.check_output = orig
        ref_tikz.TikzDocument.engines = orig_engines
    if out.status == 0 and not out.log:
        # a clean engine run: the reference records log='' -- recover the
        # index from how many engines ran (it breaks right after success)
        return calls["i"] - 1
    marker = re.search(r"%%MARKER(\d+)%%", out.log)
    assert marker, f"reference kept no attempt: {out}"
    return int(marker.group(1))


SELECT_CASES = [
    # first engine succeeds: chain stops there
    [(0, ""), (12, f"{ROOT}:5: e.\n"), (12, f"{ROOT}:9: e.\n")],
    # success mid-chain after failures
    [(12, f"({ROOT}\n{ROOT}:5: e.\n"), (0, ""), (1, "ignored")],
    # later-first-error wins
    [(12, f"({ROOT}\n{ROOT}:3: early.\n"),
     (12, f"({ROOT}\n{ROOT}:40: late.\n"),
     (12, f"({ROOT}\n{ROOT}:20: mid.\n")],
    # ties: first engine keeps the slot (strict >)
    [(12, f"({ROOT}\n{ROOT}:7: a.\n"), (12, f"({ROOT}\n{ROOT}:7: b.\n")],
    # unparseable attempts rank as line 0
    [(-1, "wiped"), (12, f"({ROOT}\n{ROOT}:2: tiny.\n")],
    [(-1, "nothing here"), (12, "also no file-line error")],
    # ranking uses the FIRST root error in log order, not the minimum
    [(12, f"({ROOT}\n{ROOT}:30: first-in-log.\n{ROOT}:2: later.\n"),
     (12, f"({ROOT}\n{ROOT}:10: only.\n")],
    # other-file errors do not count for ranking
    [(12, "(/x/a.sty\n/x/a.sty:99: sty error.\n"),
     (12, f"({ROOT}\n{ROOT}:1: root error.\n")],
    # all three fail with no errors at all
    [(2, "x"), (2, "y"), (2, "z")],
]


@pytest.mark.parametrize("i", range(len(SELECT_CASES)))
def test_engine_selection_matches_reference(i):
    attempts = SELECT_CASES[i]
    expected = ref_select(attempts)
    got = select_best_attempt(
        [(rc, log.replace(ROOT, "/real/root")) for rc, log in attempts],
        rootfile="/real/root")
    assert got == expected, f"case {i}: ours {got} vs reference {expected}"


def test_engine_selection_fuzz():
    rng = random.Random(7)
    for trial in range(40):
        n = rng.randrange(1, 4)
        attempts = []
        for _ in range(n):
            rc = rng.choice([0, 2, 12, -1]) if rng.random() < 0.3 else 12
            body = rng.choice(CORPUS)
            attempts.append((rc, body))
        expected = ref_select(attempts)
        got = select_best_attempt(
            [(rc, log.replace(ROOT, "/real/root"))
             for rc, log in attempts], rootfile="/real/root")
        assert got == expected, f"trial {trial}: {attempts}"


REAL_ROOT = "/tmp/build/doc.tex"


def _real_logs():
    from fixtures.latexmk_logs import ALL

    return [(log.replace("{ROOT}", REAL_ROOT), want) for log, want in ALL]


@pytest.mark.parametrize("i", range(5))
def test_realistic_logs_match_reference_and_expectations(i):
    """Hand-vendored realistic TeX Live logs (multi-error with l.N context,
    other-file package errors, emergency stop, warnings-only, runaway
    argument): our parser must match BOTH the reference parser and the
    hand-derived {line: msg} expectation."""
    log, want = _real_logs()[i]
    ref = ref_parse(log)
    ours = our_parse(log)
    assert ours == ref, f"divergence vs reference on realistic log {i}"
    if want == {}:
        # clean compile: the reference's errors property is only consulted
        # on failures; the raw parse must find nothing error-shaped
        assert parse_errors(log) == {}
    elif want == {0: None}:
        assert ours == {0: FATAL_ERROR_MSG}
    else:
        assert ours == want, f"unexpected parse for realistic log {i}"
