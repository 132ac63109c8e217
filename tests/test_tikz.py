"""Compile/render runtime tests (error parsing, fake backend, async pool)."""
import pytest
from PIL import Image, ImageDraw

from detikzify_tpu.infer.tikz import (CompileService, FakeBackend,
                                      TikzDocument, parse_errors)


def test_parse_errors_file_line():
    log = ("this is latexmk\n"
           "(./doc.tex\n"
           "./doc.tex:12: Undefined control sequence.\n"
           "./doc.tex:30: Missing $ inserted.\n")
    errs = parse_errors(log)
    assert errs == {12: "Undefined control sequence.",
                    30: "Missing $ inserted."}


def test_parse_errors_other_file_collapses_to_zero():
    """Errors outside the root file land on line 0 (reference
    tikz.py:66-71); without a rootfile line everything is unlocatable."""
    log = ("(./doc.tex\n"
           "/usr/share/texmf/tikz.sty:88: Package tikz Error.\n"
           "./doc.tex:5: Undefined control sequence.\n")
    assert parse_errors(log) == {0: "Package tikz Error.",
                                 5: "Undefined control sequence."}
    assert parse_errors("./doc.tex:5: no rootfile line.\n") == {
        0: "no rootfile line."}


def test_parse_errors_last_message_wins():
    log = ("(./doc.tex\n"
           "./doc.tex:7: first message.\n"
           "./doc.tex:7: second message.\n")
    assert parse_errors(log) == {7: "second message."}


def test_parse_errors_unlocatable():
    from detikzify_tpu.infer.tikz import FATAL_ERROR_MSG, FakeBackend

    # bang-lines alone are NOT parsed (reference parses only file:line:msg);
    # the fatal fallback lives on TikzDocument.errors
    assert parse_errors("! Emergency stop.\n") == {}
    assert parse_errors("all good") == {}

    class BangBackend(FakeBackend):
        def compile(self, code, timeout=60):
            from detikzify_tpu.infer.tikz import CompileResult
            return CompileResult(status=2, log="! Emergency stop.\n")

    doc = TikzDocument("x", backend=BangBackend())
    assert doc.errors == {0: FATAL_ERROR_MSG}
    assert doc.compiled_with_errors


def test_select_best_attempt_reference_ranking():
    from detikzify_tpu.infer.tikz import select_best_attempt

    root = "/tmp/build/doc.tex"
    ok = (0, "")
    late = (12, f"(./x\n{root}:40: Late error.\n")
    early = (12, f"(./x\n{root}:3: Early error.\n")
    unparsed = (-1, "timeout")
    assert select_best_attempt([early, ok, late], rootfile=root) == 1
    assert select_best_attempt([early, late], rootfile=root) == 1
    assert select_best_attempt([late, early], rootfile=root) == 0
    # unparseable ranks as line 0; first such attempt wins ties
    assert select_best_attempt([unparsed, early], rootfile=root) == 1
    assert select_best_attempt([unparsed, (-1, "also nothing")],
                               rootfile=root) == 0
    # ranking keys off the FIRST root-file error in log order, not the min
    jumbled = (12, f"(./x\n{root}:30: First in log.\n{root}:2: Later.\n")
    assert select_best_attempt([early, jumbled], rootfile=root) == 1


def test_fake_backend_ok():
    doc = TikzDocument("\\begin{tikzpicture}\n\\draw (0,0)--(1,1);\n"
                       "\\end{tikzpicture}", backend=FakeBackend())
    assert doc.status == 0
    assert doc.is_rasterizable and doc.has_content
    assert not doc.compiled_with_errors
    img = doc.rasterize(128)
    assert img.size == (128, 128)


def test_fake_backend_deterministic():
    code = "\\draw (0,0) circle (1);"
    a = TikzDocument(code, backend=FakeBackend()).rasterize()
    b = TikzDocument(code, backend=FakeBackend()).rasterize()
    assert list(a.getdata()) == list(b.getdata())
    c = TikzDocument(code + "x", backend=FakeBackend()).rasterize()
    assert list(a.getdata()) != list(c.getdata())


def test_fake_backend_error_line():
    doc = TikzDocument("line one\n\\errorline here\nline three",
                       backend=FakeBackend())
    assert doc.status == 2
    assert not doc.is_rasterizable
    assert min(doc.errors) == 2


def test_fake_backend_unbalanced_env_is_recoverable():
    doc = TikzDocument("\\begin{tikzpicture}\n\\draw (0,0)--(1,1);",
                       backend=FakeBackend())
    assert doc.status == 1
    assert doc.is_rasterizable           # salvaged output
    assert doc.compiled_with_errors      # but with errors
    assert min(doc.errors) == 1


def test_compile_service_async():
    with CompileService(workers=2, backend=FakeBackend()) as svc:
        futures = [svc.submit(f"\\draw ({i},0);") for i in range(5)]
        docs = [f.result(timeout=30) for f in futures]
    assert all(d.is_rasterizable for d in docs)


def test_save(tmp_path):
    doc = TikzDocument("\\draw (0,0)--(1,1);", backend=FakeBackend())
    doc.save(str(tmp_path / "out.tex"))
    assert (tmp_path / "out.tex").read_text() == doc.code
    doc.save(str(tmp_path / "out.png"))
    assert (tmp_path / "out.png").stat().st_size > 0
    with pytest.raises(ValueError):
        doc.save(str(tmp_path / "out.pdf"))   # fake backend has no PDF


def test_raster_crop_margins_geometry():
    """Raster-space crop = tight ink bbox shaved by 1pt at render dpi
    (pdfCropMargins -p 0 -a -1 emulation, reference tikz.py:134-137)."""
    from detikzify_tpu.infer.tikz import PT_SHAVE, raster_crop_margins

    img = Image.new("RGB", (400, 300), "white")
    ImageDraw.Draw(img).rectangle([50, 40, 249, 199], fill="black")
    dpi = 144.0
    shave = int(round(PT_SHAVE * dpi / 72.0))      # 2 px at 144 dpi
    out = raster_crop_margins(img, dpi)
    assert out.size == (200 - 2 * shave, 160 - 2 * shave)
    # all-white page: unchanged
    blank = Image.new("RGB", (100, 100), "white")
    assert raster_crop_margins(blank, dpi).size == (100, 100)
    # degenerate content smaller than the shave: falls back to tight bbox
    tiny = Image.new("RGB", (100, 100), "white")
    ImageDraw.Draw(tiny).point((50, 50), fill="black")
    assert raster_crop_margins(tiny, dpi).size == (1, 1)


def test_expand_scale_to_pad_geometry():
    """expand() == ImageOps.pad: longest side scaled to size, centered on
    white (reference util/image.py:30-33 + rasterize tikz.py:149-156)."""
    import numpy as np

    from detikzify_tpu.utils.image import expand

    img = Image.new("RGB", (200, 100), "black")
    out = expand(img, 420)
    assert out.size == (420, 420)
    arr = np.asarray(out)
    mask = (arr != 255).any(axis=2)
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    # content spans full width, half height, vertically centered
    assert cols[0] == 0 and cols[-1] == 419
    assert abs((rows[0] + rows[-1]) / 2 - 209.5) <= 1.0
    assert abs((rows[-1] - rows[0] + 1) - 210) <= 2


def test_crop_pdf_margins_passthrough_without_pymupdf():
    from detikzify_tpu.infer.tikz import crop_pdf_margins

    data = b"%PDF-1.4 not really a pdf"
    assert crop_pdf_margins(data) == data


def test_latexmk_backend_executes_against_emulated_binary(tmp_path,
                                                          monkeypatch):
    """Execute LatexmkBackend's REAL subprocess path end-to-end against an
    emulated ``latexmk`` binary (no TeX Live in this environment): CLI
    flag wiring (reference tikz.py:111-119), shared-build-dir engine
    chain, stale-log removal, log/PDF collection, error-line parse, and
    \\thispagestyle injection. Closes the 'LatexmkBackend never executed'
    leg as far as an offline box allows."""
    import os
    import stat

    from detikzify_tpu.infer.tikz import (LatexmkBackend, TikzDocument,
                                          parse_errors, set_backend)

    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    arglog = tmp_path / "args.log"
    fake = bin_dir / "latexmk"
    fake.write_text(f"""#!/bin/bash
out=""; engine=""; tex=""
for a in "$@"; do
  case "$a" in
    -output-directory=*) out="${{a#-output-directory=}}";;
    -pdflatex|-lualatex|-xelatex) engine="${{a#-}}";;
    -*) ;;
    *) tex="$a";;
  esac
done
echo "$engine $*" >> "{arglog}"
if grep -q "FAILLINE" "$tex"; then
  n=$(grep -n "FAILLINE" "$tex" | head -1 | cut -d: -f1)
  printf '(./doc.tex\\n./doc.tex:%s: Forced test error.\\n' "$n" \\
      > "$out/doc.log"
  exit 12
fi
if grep -q "ONLYLUA" "$tex" && [ "$engine" = pdflatex ]; then
  printf '(./doc.tex\\n! Emergency stop.\\n' > "$out/doc.log"
  exit 12
fi
printf 'Output written on doc.pdf (1 page).\\n' > "$out/doc.log"
printf '%%PDF-1.4 emulated test pdf' > "$out/doc.pdf"
exit 0
""")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")

    backend = LatexmkBackend()
    assert LatexmkBackend.available()

    # 1. success: first engine (pdflatex) wins; flags wired like the
    # reference; \thispagestyle{empty} injected
    code = "\\begin{document}\\tikz{\\draw (0,0) -- (1,1);}\\end{document}"
    res = backend.compile(code)
    assert res.status == 0 and res.pdf is not None
    assert res.pdf.startswith(b"%PDF-1.4")
    lines = arglog.read_text().splitlines()
    assert lines[-1].startswith("pdflatex ")
    argv = lines[-1].split()
    for flag in ("-f", "-norc", "-file-line-error",
                 "-interaction=nonstopmode", "-nobibtex"):
        assert flag in argv, (flag, argv)
    arglog.write_text("")

    # 2. engine chain: pdflatex fails, lualatex salvages
    res = backend.compile("% ONLYLUA\n" + code)
    assert res.status == 0 and res.pdf is not None
    engines = [ln.split()[0] for ln in arglog.read_text().splitlines()]
    assert engines[:2] == ["pdflatex", "lualatex"]
    arglog.write_text("")

    # 3. all engines fail at a located line: status != 0, error parsed.
    # The fake reports the marker's ACTUAL line in the compiled file, so
    # this also pins that _prepare's \documentclass prepend does NOT
    # shift line numbers (it must land on the same line as the caller's
    # first line -- MCTS error-line-bounded attach depends on doc.errors
    # keys indexing doc.code lines).
    res = backend.compile("line one\n% FAILLINE marker\nline three\n"
                          "\\errorhere")
    assert res.status != 0 and res.pdf is None
    assert parse_errors(res.log) == {2: "Forced test error."}
    # full document flow: errors surface through TikzDocument
    set_backend(backend)
    try:
        doc = TikzDocument("line one\n% FAILLINE marker\nline three")
        assert doc.compiled_with_errors
        assert not doc.is_rasterizable
        assert 2 in doc.errors
    finally:
        set_backend(None)
    # every engine in the chain was attempted before giving up
    engines = [ln.split()[0] for ln in arglog.read_text().splitlines()]
    assert engines[:3] == ["pdflatex", "lualatex", "xelatex"]
