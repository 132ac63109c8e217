"""Compile/render runtime tests (error parsing, fake backend, async pool)."""
import pytest

from detikzify_tpu.infer.tikz import (CompileService, FakeBackend,
                                      TikzDocument, parse_errors)


def test_parse_errors_file_line():
    log = ("this is latexmk\n"
           "./doc.tex:12: Undefined control sequence.\n"
           "./doc.tex:30: Missing $ inserted.\n")
    errs = parse_errors(log)
    assert errs == {12: "Undefined control sequence.",
                    30: "Missing $ inserted."}


def test_parse_errors_unlocatable():
    assert parse_errors("! Emergency stop.\n") == {0: "Emergency stop."}
    assert parse_errors("all good") == {}


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
