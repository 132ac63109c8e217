"""Streamers, webui helpers, dataset shims, image utils."""
import io
import tarfile
import threading

import numpy as np
import pytest
from PIL import Image

from detikzify_tpu.config import tiny_test_config
from detikzify_tpu.dataset.paper2fig import iter_paper2fig
from detikzify_tpu.infer import FakeBackend, TikzDocument
from detikzify_tpu.processing import ByteTokenizer, DetikzifyProcessor
from detikzify_tpu.utils import (DUMMY_IMAGE, ExplicitAbort, StreamerList,
                                 TextIteratorStreamer, TokenStreamer, expand,
                                 load, trim, unwrap_processor)
from detikzify_tpu.webui.helpers import GeneratorLock, MctsOutputs


def test_token_streamer_roundtrip():
    streamer = TokenStreamer()
    collected = []

    def consume():
        collected.extend(streamer)

    thread = threading.Thread(target=consume)
    thread.start()
    for t in [1, 2, 3]:
        streamer.put(t)
    streamer.end()
    thread.join(5)
    assert collected == [1, 2, 3]


def test_token_streamer_error_propagation():
    streamer = TokenStreamer()
    streamer.put(1)
    streamer.propagate_error(RuntimeError("boom"))
    it = iter(streamer)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        next(it)


def test_text_iterator_streamer_multibyte():
    cfg = tiny_test_config()
    tok = ByteTokenizer(vocab_size=512)
    proc = DetikzifyProcessor(tok, cfg)
    streamer = TextIteratorStreamer(proc)
    text = "a→b"
    for b in text.encode("utf-8"):
        streamer.put(b)
    streamer.end()
    assert "".join(streamer) == text


def test_streamer_list_fanout():
    a, b = TokenStreamer(), TokenStreamer()
    fan = StreamerList([a, b])
    fan.put(7)
    fan.end()
    assert list(a) == [7] and list(b) == [7]


def test_unwrap_processor():
    cfg = tiny_test_config()
    tok = ByteTokenizer(vocab_size=512)
    base = DetikzifyProcessor(tok, cfg)
    from detikzify_tpu.processing_adapter import AdapterProcessor

    wrapped = AdapterProcessor(base, tok)
    assert unwrap_processor(wrapped) is base


def test_mcts_outputs_dedup_and_order():
    out = MctsOutputs()
    d1 = TikzDocument("\\draw a;", backend=FakeBackend())
    d2 = TikzDocument("\\draw b;", backend=FakeBackend())
    out.add(0.5, d1)
    out.add(0.9, d2)
    out.add(0.4, d1)          # duplicate, lower score -> ignored
    assert len(out) == 2
    assert out.programs == ["\\draw b;", "\\draw a;"]


def test_generator_lock_aborts_previous():
    control = ExplicitAbort()
    lock = GeneratorLock(control)
    with lock:
        pass
    assert not control.should_stop

    import threading as th

    entered = th.Event()
    release = th.Event()

    def hold():
        with lock:
            entered.set()
            release.wait(5)

    t = th.Thread(target=hold)
    t.start()
    entered.wait(5)
    aborted = []

    def second():
        with lock:
            aborted.append(control.should_stop)

    t2 = th.Thread(target=second)
    t2.start()
    import time

    time.sleep(0.1)
    assert control.should_stop    # second acquire aborted the first
    release.set()
    t.join(5)
    t2.join(5)


def test_paper2fig_iter(tmp_path):
    """Builder reads a synthetic Paper2Fig-style tar archive."""
    img = Image.new("RGB", (50, 30), "white")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    meta = [{"figure_id": "fig1", "captions": ["a caption", "a mention"],
             "ocr_result": {"ocr_result": [{"text": "label"}]}}]
    archive = tmp_path / "p2f.tar"
    with tarfile.open(archive, "w") as tf:
        import json as json_mod

        data = json_mod.dumps(meta).encode()
        info = tarfile.TarInfo("meta.json")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
        png = buf.getvalue()
        info = tarfile.TarInfo("figures/fig1.png")
        info.size = len(png)
        tf.addfile(info, io.BytesIO(png))
    rows = list(iter_paper2fig(str(archive), size=64))
    assert len(rows) == 1
    assert rows[0]["caption"] == "a caption"
    assert rows[0]["ocr"] == ["label"]
    assert rows[0]["image"].size == (64, 64)


def test_image_utils():
    img = Image.new("RGB", (100, 60), "white")
    from PIL import ImageDraw

    ImageDraw.Draw(img).rectangle([40, 20, 60, 40], fill="black")
    trimmed = trim(img)
    assert trimmed.size[0] <= 22 and trimmed.size[1] <= 22
    sq = expand(img, 50, do_trim=True)
    assert sq.size == (50, 50)
    assert load(img).mode == "RGB"
    assert DUMMY_IMAGE.size == (24, 24)

    import base64

    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    assert load(b64).size == img.size


def test_scicap_loader_end_to_end(tmp_path):
    """SciCap: COCO-style json + (multi-part) image zip -> item stream,
    exercised against SYNTHETIC archives built in the reference's release
    format (split zip volumes rejoined with zip -FF)."""
    import io
    import json
    import shutil
    import subprocess
    import zipfile

    import pytest
    from PIL import Image

    from detikzify_tpu.dataset.scicap import (iter_scicap, load_scicap,
                                              rejoin_multipart_zip)

    # build images + COCO-style annotations
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annots = [], []
    rng = np.random.default_rng(0)
    for i in range(3):
        # noise images: incompressible, so the zip exceeds the 64 KB
        # minimum volume size and actually splits
        im = Image.fromarray(
            rng.integers(0, 256, (200, 220 + 10 * i, 3), np.uint8), "RGB")
        im.save(img_dir / f"fig{i}.png")
        images.append({"id": i, "file_name": f"fig{i}.png",
                       "ocr": [f"ocr{i}"]})
        annots.append({"image_id": i, "caption_no_index": f"caption {i}",
                       "mention": [[f"Fig. {i}"]],
                       "paragraph": [f"para {i}"]})
    text_json = tmp_path / "ann.json"
    text_json.write_text(json.dumps(
        {"images": images, "annotations": annots}))

    whole = tmp_path / "imgs.zip"
    with zipfile.ZipFile(whole, "w") as zf:
        for i in range(3):
            zf.write(img_dir / f"fig{i}.png", f"share/fig{i}.png")

    items = list(iter_scicap(str(text_json), str(whole), size=64))
    assert len(items) == 3
    assert items[1]["caption"] == "caption 1"
    assert items[1]["ocr"] == ["ocr1"]
    assert items[2]["image"].size == (64, 64)

    if shutil.which("zip") is None:
        pytest.skip("zip tool unavailable for the multi-part path")
    # a GENUINE multi-volume archive (zip -s), like the SciCap release
    split_dir = tmp_path / "split"
    split_dir.mkdir()
    subprocess.run(["zip", "-s", "64k", "-j", "-q",
                    str(split_dir / "imgs-split.zip")]
                   + [str(img_dir / f"fig{i}.png") for i in range(3)],
                   check=True)
    parts = sorted(str(p) for p in split_dir.iterdir())
    assert len(parts) >= 2, parts      # .z01(+) and .zip
    joined = str(tmp_path / "joined.zip")
    rejoin_multipart_zip(parts, joined)
    items2 = list(iter_scicap(str(text_json), joined, size=64))
    assert [it["caption"] for it in items2] == \
        [it["caption"] for it in items]
