"""Golden parity gate vs the ACTUAL upstream reference implementation.

Builds one tiny real-format HF checkpoint (2-layer SigLIP + 2-layer LLaMA +
a trained byte-level BPE tokenizer on disk), loads it with BOTH stacks --
the reference's own ``detikzify.model.load()`` (torch, /root/reference) and
this repo's ``detikzify_tpu.models.load()`` (JAX) -- and diffs behavior at
token level:

  * processor outputs (ids + pixels) -- reference processing_detikzify.py
  * greedy generation token ids      -- reference infer/generate.py:218-227
  * newlineinfo line segmentation    -- reference infer/generate.py:229-244
  * MCTS traces (solution stream + full tree shape) under a shared fake
    compiler with greedy rollouts    -- reference infer/generate.py:305-353

Any token-level divergence fails. This is the "we match the reference, not
our reading of it" gate (VERDICT round 1, next-round item #1).
"""
import random

import numpy as np
import pytest
import torch
from PIL import Image, ImageDraw

import jax
import jax.numpy as jnp

from reference_loader import load_reference

load_reference()

from detikzify.infer.generate import DetikzifyGenerator as RefGenerator  # noqa: E402
from detikzify.model import DetikzifyConfig as RefConfig  # noqa: E402
from detikzify.model import DetikzifyForConditionalGeneration as RefModel  # noqa: E402
from detikzify.model.processing_detikzify import (  # noqa: E402
    DetikzifyProcessor as RefProcessor,
)

from detikzify_tpu.engine import DecodeEngine  # noqa: E402
from detikzify_tpu.infer.generator import DetikzifyGenerator  # noqa: E402
from detikzify_tpu.infer.tikz import CompileService, FakeBackend, parse_errors  # noqa: E402
from detikzify_tpu.models.load import load as our_load  # noqa: E402
from detikzify_tpu.ops.sampling import SamplingParams, make_newline_table  # noqa: E402

MAX_NEW = 24
MCTS_MAX_LENGTH = 80
EXPANSIONS = 8

TIKZ_CORPUS = [
    "\\documentclass{article}\n\\begin{document}\nHello\n\\end{document}\n",
    "\\begin{tikzpicture}\n\\draw (0,0) -- (1,1);\n\\node at (2,2) {x};\n"
    "\\end{tikzpicture}\n",
    "\\draw[red,thick] circle (3);\n\\fill[blue] rectangle (2,2);\n",
    "x y z 0 1 2 3 4 5 6 7 8 9 ( ) { } [ ] ; , . - + = \n\n\n",
]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    """Shared tiny checkpoint saved by the REFERENCE implementation."""
    import transformers
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    torch.manual_seed(0)
    path = str(tmp_path_factory.mktemp("parity") / "ckpt")

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=320, special_tokens=["<pad>", "<s>", "</s>", "<image>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(TIKZ_CORPUS, trainer)
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        pad_token="<pad>", additional_special_tokens=["<image>"],
        model_max_length=128)
    image_token_id = fast.convert_tokens_to_ids("<image>")

    ref_cfg = RefConfig(
        vision_config=dict(hidden_size=48, intermediate_size=96,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=42, patch_size=14),
        text_config=dict(model_type="llama", vocab_size=len(fast),
                         hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=256,
                         rope_theta=10000.0, rms_norm_eps=1e-5,
                         bos_token_id=fast.bos_token_id,
                         eos_token_id=fast.eos_token_id,
                         pad_token_id=fast.pad_token_id),
        image_token_id=image_token_id, concat_factor=3,
        pad_token_id=fast.pad_token_id)
    ref_model = RefModel(ref_cfg).eval()
    ref_model.save_pretrained(path, safe_serialization=True)
    fast.save_pretrained(path)

    image_processor = transformers.SiglipImageProcessor(
        size={"height": 42, "width": 42},
        image_mean=[0.5] * 3, image_std=[0.5] * 3)
    ref_proc = RefProcessor(image_processor=image_processor, tokenizer=fast,
                            image_seq_len=3, image_token="<image>")
    ref_proc.save_pretrained(path)

    # round-trip through the REFERENCE's own loader (model/__init__.py:28)
    import detikzify.model as ref_model_mod

    ref_model2, ref_proc2 = ref_model_mod.load(path, dtype=torch.float32)
    ref_model2.eval()

    params, our_cfg, our_proc = our_load(path, dtype=jnp.float32)
    engine = DecodeEngine(params, our_cfg, num_slots=2, max_len=128,
                          cache_dtype=jnp.float32,
                          sampling=SamplingParams(temperature=0.0))
    return dict(path=path, tokenizer=fast, image_token_id=image_token_id,
                ref_model=ref_model2, ref_proc=ref_proc2,
                params=params, our_cfg=our_cfg, our_proc=our_proc,
                engine=engine)


def _figure():
    img = Image.new("RGB", (42, 42), "white")
    ImageDraw.Draw(img).ellipse([8, 8, 34, 34], outline="black", width=2)
    ImageDraw.Draw(img).line([4, 38, 38, 4], fill="blue", width=1)
    return img


# ---------------------------------------------------------------------------
# processor parity
# ---------------------------------------------------------------------------

def test_processor_parity(ckpt):
    img = _figure()
    for text, kwargs in [("", {}), ("\\draw (0,0)", {}),
                         ("a caption", {"add_bos_token": True}),
                         ("x;", {"add_eos_token": True})]:
        ref = ckpt["ref_proc"](images=img, text=text, return_tensors="pt",
                               **kwargs)
        ours = ckpt["our_proc"](images=img, text=text, **kwargs)
        assert ref["input_ids"][0].tolist() == ours.input_ids[0].tolist(), \
            f"input_ids diverge for text={text!r} {kwargs}"
        rpix = ref["pixel_values"][0].numpy()               # [C, H, W]
        opix = np.transpose(ours.pixel_values[0], (2, 0, 1))
        np.testing.assert_allclose(rpix, opix, atol=1e-6)


# ---------------------------------------------------------------------------
# greedy generation parity
# ---------------------------------------------------------------------------

def _ref_greedy(ckpt, input_ids, pixel_values, max_new):
    """model.generate with the exact kwargs reference DetikzifyGenerator
    uses (infer/generate.py:218-227), greedy."""
    with torch.inference_mode():
        out = ckpt["ref_model"].generate(
            input_ids=input_ids, pixel_values=pixel_values,
            do_sample=False, max_new_tokens=max_new,
            bad_words_ids=[[ckpt["image_token_id"]]],
            begin_suppress_tokens=[ckpt["tokenizer"].eos_token_id])
    return out[0].tolist()


def _our_greedy(ckpt, prompt, pixel_values, max_new):
    eng = ckpt["engine"]
    embeds = eng.encode_image(jnp.asarray(pixel_values))
    ro = eng.start(list(prompt), image_embeds=embeds, max_new_tokens=max_new)
    eng.run()
    toks = list(ro.token_ids)
    eng.release(ro)
    return toks


def test_greedy_token_parity(ckpt):
    img = _figure()
    prompts = ["", "\\draw (0,0)", "\\begin{tikzpicture}\n"]
    for text in prompts:
        ref_in = ckpt["ref_proc"](images=img, text=text, return_tensors="pt")
        our_in = ckpt["our_proc"](images=img, text=text)
        ref_tokens = _ref_greedy(ckpt, ref_in["input_ids"],
                                 ref_in["pixel_values"], MAX_NEW)
        our_tokens = _our_greedy(ckpt, [int(t) for t in our_in.input_ids[0]],
                                 our_in.pixel_values, MAX_NEW)
        n = min(len(ref_tokens), len(our_tokens))
        assert our_tokens[:n] == ref_tokens[:n], \
            f"greedy tokens diverge for prompt {text!r}"
        assert len(our_tokens) == len(ref_tokens), \
            f"stop behavior diverges for prompt {text!r}"


# ---------------------------------------------------------------------------
# newlineinfo parity
# ---------------------------------------------------------------------------

def test_newlineinfo_parity(ckpt):
    ref_gen = RefGenerator(model=ckpt["ref_model"], processor=ckpt["ref_proc"],
                           image=_figure(), metric=None,
                           do_sample=False, max_length=MCTS_MAX_LENGTH)
    ref_info = {tid: (ns.num_lines, ns.trailing)
                for tid, ns in ref_gen.newlineinfo.items()}
    counts, ends = make_newline_table(ckpt["tokenizer"], len(ckpt["tokenizer"]))
    our_info = {i: (int(counts[i]), bool(ends[i]))
                for i in np.nonzero(counts)[0]}
    assert our_info == ref_info


# ---------------------------------------------------------------------------
# MCTS trace parity (shared fake compiler, greedy rollouts)
# ---------------------------------------------------------------------------

class FakeDoc:
    """Compile double shared by both MCTS stacks: deterministic in the code
    string (this repo's hermetic FakeBackend), exposing the TikzDocument
    surface both child_finders consume."""

    _backend = FakeBackend()

    def __init__(self, code: str):
        self.code = code
        result = self._backend.compile(code)
        self.status = result.status
        self.errors = (parse_errors(result.log) if result.status != 0
                       else {})
        self.is_rasterizable = result.image is not None
        # true reference semantics (tikz.py:50-52): nonzero status IS
        # compiled-with-errors, PDF or not -- fatal compiles score -1
        self.compiled_with_errors = self.status != 0

    def compile(self):
        return self

    def rasterize(self, size: int = 420):
        return self._backend.compile(self.code).image


def _serialize(node, widen_attr="is_widen_node"):
    ids = node.state.token_ids
    ids = ids.tolist() if hasattr(ids, "tolist") else list(ids)
    win = node.win_value
    win = float(win) if isinstance(win, (int, float)) else None
    return {
        "ids": [int(t) for t in ids],
        "visits": node.visits,
        "widen": bool(getattr(node, widen_attr)),
        "win": win,
        "children": [_serialize(c, widen_attr) for c in node.children],
    }


def test_mcts_trace_parity(ckpt):
    img = _figure()

    # --- reference: torch generator, greedy, fast-metric, fake compiler ---
    ref_gen = RefGenerator(model=ckpt["ref_model"], processor=ckpt["ref_proc"],
                           image=img, metric=None,
                           do_sample=False, max_length=MCTS_MAX_LENGTH)
    ref_root_len = len(ref_gen.montecarlo.root_node.token_ids)

    def ref_decode(token_ids):
        code = ckpt["ref_proc"].decode(
            token_ids=token_ids[ref_root_len:], skip_special_tokens=True)
        return FakeDoc(code)

    ref_gen.decode = ref_decode
    random.seed(1234)
    ref_trace = []
    for _ in range(EXPANSIONS):
        ref_gen.montecarlo.simulate()
        score, doc = ref_gen.solution.pop()
        ref_trace.append((float(score), doc.code))

    # --- ours: decode engine generator, greedy, fast mode, same compiler ---
    service = CompileService(workers=1, backend=FakeBackend())
    our_gen = DetikzifyGenerator(
        engine=ckpt["engine"], processor=ckpt["our_proc"], image=img,
        metric=None, compile_service=service,
        max_length=MCTS_MAX_LENGTH,
        sampling=SamplingParams(temperature=0.0))
    our_root_len = len(our_gen.root.token_ids)
    assert our_root_len == ref_root_len

    def our_decode(token_ids):
        code = ckpt["our_proc"].decode(
            list(token_ids)[our_root_len:], skip_special_tokens=True)
        return FakeDoc(code)

    our_gen.decode = our_decode
    random.seed(1234)
    our_trace = []
    sim = our_gen.simulate(expansions=EXPANSIONS)
    for score, doc in sim:
        our_trace.append((float(score), doc.code))
    our_gen.close()

    assert our_trace == ref_trace, "MCTS solution streams diverge"

    ref_tree = _serialize(ref_gen.montecarlo.root_node)
    our_tree = _serialize(our_gen.montecarlo.root_node)
    assert our_tree == ref_tree, "MCTS tree shapes diverge"


# ---------------------------------------------------------------------------
# MCTS trace parity with SCRIPTED rollouts: exercises error-line-bounded
# attach, failed-rollout replay, widen merge, and scorable attach with
# identical deterministic rollout streams on both sides.
# ---------------------------------------------------------------------------

GOOD1 = "\\draw (0,0) -- (1,1);\n"
BAD = "\\errorline\n"
GOOD2 = "\\node at (2,2) {x};\n"
OPEN = "\\begin{tikzpicture}\n"


class ScriptedEngine:
    """Engine double: rollouts come from a deterministic script of the
    prompt, mirroring what the scripted reference ``generate`` emits."""

    def __init__(self, script, eos_token_id, max_len=128, num_slots=2):
        self.script = script
        self.eos_token_id = eos_token_id
        self.max_len = max_len
        self.num_slots = num_slots
        self.num_active = 0

    def encode_image(self, pixel_values, adapter_inputs=None):
        return None

    def best_prefix(self, ids, namespace=None):
        return None

    def start(self, token_ids, image_embeds=None, max_new_tokens=1024,
              prefix=None, on_token=None, lazy=False, sampling=None):
        import types

        cont = list(self.script(tuple(token_ids)))[:max_new_tokens]
        ro = types.SimpleNamespace(
            token_ids=list(token_ids) + cont, finished=True,
            new_tokens=len(cont), prompt_len=len(token_ids), slot=0,
            length=len(token_ids) + len(cont))
        return ro

    def step(self, k=None):
        return []

    def abort(self, ro):
        pass

    def release(self, ro):
        pass

    def store_prefix(self, key, ro, length=None, namespace=None):
        return None

    def has_prefix(self, key):
        return False

    def drop_prefix(self, key):
        pass

    def drop_namespace(self, namespace):
        pass


def _make_script(tokenizer, root_len, eos):
    enc = lambda s: tokenizer.encode(s, add_special_tokens=False)  # noqa: E731

    def script(prefix_ids):
        code = tokenizer.decode(list(prefix_ids)[root_len:],
                                skip_special_tokens=True)
        if code == "":
            # root rollout: SALVAGED (unbalanced env -> status 1, score 0
            # under true reference semantics) so the search keeps exploring
            # instead of replaying a fatal root rollout forever
            return enc(GOOD1) + enc(GOOD2) + enc(OPEN) + [eos]
        if code == GOOD1:
            # fatal at line 3: error-bounded attach (line-2 prefix kept)
            # + failed-rollout caching
            return enc(GOOD2) + enc(BAD) + enc(GOOD2) + [eos]
        if code == GOOD1 + GOOD2:
            return enc(GOOD1) + [eos]          # clean compile: score 1
        # deeper continuations are fatal with a full line BEYOND the
        # error line: failed-rollout caching (num_lines > errorln) on a
        # branch the search actually visits
        return enc(BAD) + enc(GOOD2) + [eos]

    return script


def test_mcts_scripted_trace_parity(ckpt):
    img = _figure()
    fast = ckpt["tokenizer"]
    eos = fast.eos_token_id

    # --- reference with scripted generate ---
    ref_gen = RefGenerator(model=ckpt["ref_model"], processor=ckpt["ref_proc"],
                           image=img, metric=None,
                           do_sample=False, max_length=MCTS_MAX_LENGTH)
    ref_root_len = len(ref_gen.montecarlo.root_node.token_ids)
    script = _make_script(fast, ref_root_len, eos)

    def ref_generate(input_ids, streamer=None, **gen_kwargs):
        ids = input_ids.tolist()
        if (ids and ids[-1] == eos) or len(ids) >= MCTS_MAX_LENGTH:
            if streamer is not None:
                streamer.end()
            return input_ids
        # model.generate(max_length=N) caps the TOTAL sequence length
        cont = script(tuple(ids))[:max(0, MCTS_MAX_LENGTH - len(ids))]
        if streamer is not None:
            streamer.put(input_ids)               # prompt chunk (skipped)
            for t in cont:
                streamer.put(torch.tensor([t]))
            streamer.end()
        return torch.cat([input_ids, torch.tensor(cont,
                                                  dtype=input_ids.dtype)])

    ref_gen.generate = ref_generate

    def ref_decode(token_ids):
        return FakeDoc(ckpt["ref_proc"].decode(
            token_ids=token_ids[ref_root_len:], skip_special_tokens=True))

    ref_gen.decode = ref_decode
    random.seed(99)
    ref_trace = []
    for _ in range(EXPANSIONS):
        ref_gen.montecarlo.simulate()
        score, doc = ref_gen.solution.pop()
        ref_trace.append((float(score), doc.code))

    # the script must actually exercise the interesting paths (fast-mode
    # scores, reference generate.py:340: 1 = clean compile, 0 = salvaged
    # with errors, -1 = fatal failure)
    codes = [c for _, c in ref_trace]
    assert any(s == -1 for s, _ in ref_trace), "no fatal rollout in trace"
    assert any(s == 0 for s, _ in ref_trace), "no salvaged rollout in trace"
    assert any(s == 1 for s, _ in ref_trace), "no scorable rollout in trace"
    assert len(set(codes)) > 1, "degenerate trace"
    assert ref_gen.failed_rollouts, "error-bounded attach path not hit"

    # --- ours on a scripted engine double ---
    service = CompileService(workers=1, backend=FakeBackend())
    our_gen = DetikzifyGenerator(
        engine=ScriptedEngine(script, eos, max_len=128),
        processor=ckpt["our_proc"], image=img, metric=None,
        compile_service=service, max_length=MCTS_MAX_LENGTH)
    our_root_len = len(our_gen.root.token_ids)
    assert our_root_len == ref_root_len

    def our_decode(token_ids):
        return FakeDoc(ckpt["our_proc"].decode(
            list(token_ids)[our_root_len:], skip_special_tokens=True))

    our_gen.decode = our_decode
    random.seed(99)
    our_trace = []
    for score, doc in our_gen.simulate(expansions=EXPANSIONS):
        our_trace.append((float(score), doc.code))
    our_gen.close()

    assert our_trace == ref_trace, "scripted MCTS solution streams diverge"
    assert _serialize(our_gen.montecarlo.root_node) == \
        _serialize(ref_gen.montecarlo.root_node), "scripted trees diverge"


def test_caption_conditioned_prompt_parity(ckpt):
    """TikZero+ prompt layout (model_expects_text): image tokens + caption
    + <bos> separator must match the reference processor token-for-token,
    and greedy continuation from that prompt must match the reference
    model."""
    import transformers

    from detikzify_tpu.processing import DetikzifyProcessor as OurProcessor

    img = _figure()
    fast = ckpt["tokenizer"]
    image_processor = transformers.SiglipImageProcessor(
        size={"height": 42, "width": 42},
        image_mean=[0.5] * 3, image_std=[0.5] * 3)
    ref_plus = RefProcessor(image_processor=image_processor, tokenizer=fast,
                            image_seq_len=3, image_token="<image>",
                            model_expects_text=True)
    our_plus = OurProcessor(fast, ckpt["our_cfg"], model_expects_text=True)

    caption = "a circle with a line"
    # the reference's AdapterProcessor routes captions into the base
    # processor with add_bos_token=True when model_expects_text
    ref_in = ref_plus(images=img, text=caption, add_bos_token=True,
                      return_tensors="pt")
    our_in = our_plus(images=img, text=caption, add_bos_token=True)
    assert ref_in["input_ids"][0].tolist() == our_in.input_ids[0].tolist()
    assert our_in.input_ids[0][-1] == fast.bos_token_id

    ref_tokens = _ref_greedy(ckpt, ref_in["input_ids"],
                             ref_in["pixel_values"], 16)
    our_tokens = _our_greedy(ckpt, [int(t) for t in our_in.input_ids[0]],
                             our_in.pixel_values, 16)
    assert our_tokens == ref_tokens


def test_selfsim_feature_parity(ckpt):
    """SelfSim (cos mode) vision features + similarity must match the
    reference ImageSim implementation on the shared checkpoint (same
    trim -> pad-square -> bicubic preprocessing, same pooled-embedding
    cosine)."""
    import torch.nn.functional as F

    from detikzify.evaluate.imagesim import ImageSim as RefImageSim

    from detikzify_tpu.evaluate.imagesim import ImageSim

    ref_metric = RefImageSim.from_detikzify(ckpt["ref_model"],
                                            ckpt["ref_proc"], mode="cos")
    # torchmetrics is stubbed: pin the device/dtype attrs it would manage
    ref_metric.dtype = torch.float32
    ref_metric.device = torch.device("cpu")
    our_metric = ImageSim(ckpt["params"].vision, ckpt["our_cfg"],
                          mode="cos")

    img1 = _figure()
    img2 = Image.new("RGB", (60, 40), "white")
    ImageDraw.Draw(img2).rectangle([5, 5, 50, 34], outline="red", width=2)

    for img in (img1, img2):
        want = ref_metric.get_vision_features(img).float().numpy()
        got = np.asarray(our_metric.features(img))[0]
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    want_sim = float(F.cosine_similarity(
        ref_metric.get_vision_features(img1)[None].float(),
        ref_metric.get_vision_features(img2)[None].float()))
    got_sim = our_metric.score(img1, img2)
    assert abs(got_sim - want_sim) < 1e-3


def test_train_tokenize_parity(ckpt):
    """Training tokenization (image tokens + code + <eos>, labels masking
    image/pad) must match the reference train.pretrain.tokenize on the
    shared checkpoint."""
    from detikzify.train.pretrain import tokenize as ref_tokenize

    from detikzify_tpu.train.data import tokenize_batch

    imgs = [_figure(), _figure()]
    texts = ["\\draw (0,0) -- (1,1);", "\\node at (2,2) {x};\n"]
    ref = ref_tokenize({"text": texts, "image": imgs}, ckpt["ref_proc"],
                       padding=True)
    ours = tokenize_batch(ckpt["our_proc"], texts, imgs)
    for i in range(2):
        mask = ours["attention_mask"][i]
        n = int(mask.sum())
        assert list(ours["input_ids"][i][:n]) == ref["input_ids"][i][:n]
        assert list(ours["labels"][i][:n]) == ref["labels"][i][:n]
        # padding labels masked on both sides
        assert all(v == -100 for v in ref["labels"][i][n:])
        assert (ours["labels"][i][n:] == -100).all()


def test_adapter_block_parity(tmp_path):
    """TikZero gated cross-attention: import a REFERENCE-SAVED adapter
    checkpoint and reproduce its active layer's output exactly (q/k-norm,
    sigmoid gates, caption connector, additive mask semantics)."""
    import transformers

    from detikzify.model.adapter.modeling_adapter import (
        CrossAttentionAdapter,
    )

    from detikzify_tpu.config import AdapterConfig, VisionConfig
    from detikzify_tpu.models import siglip
    from detikzify_tpu.models.adapter import make_inputs
    from detikzify_tpu.models.import_hf import (
        import_adapter, load_state_dict_from_safetensors,
    )

    torch.manual_seed(7)
    vis_cfg = transformers.SiglipVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, image_size=42, patch_size=14,
        attn_implementation="eager")
    ref_adapter = CrossAttentionAdapter(vis_cfg, input_hidden_size=32,
                                        cross_attn_every_n_layers=2).eval()
    path = str(tmp_path / "adapter")
    ref_adapter.save_pretrained(path, safe_serialization=True)

    vcfg = VisionConfig(hidden_size=48, intermediate_size=96,
                        num_hidden_layers=2, num_attention_heads=4,
                        image_size=42, patch_size=14)
    acfg = AdapterConfig(embedding_hidden_size=32,
                         cross_attn_every_n_layers=2,
                         num_attention_heads=4)
    state = load_state_dict_from_safetensors(path)
    aparams = import_adapter(state, vcfg, acfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    hidden = rng.standard_normal((2, 9, 48)).astype(np.float32)
    embeds = rng.standard_normal((2, 5, 32)).astype(np.float32)
    mask = np.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.int64)

    # reference: layer idx 1 is the active block ((idx+1) % 2 == 0)
    with torch.inference_mode():
        cross = ref_adapter.connect(torch.from_numpy(embeds))
        mask4d = ref_adapter.prepare_4d_attention_mask(
            torch.from_numpy(mask), cross.dtype)
        want = ref_adapter.layers[1](
            torch.from_numpy(hidden), cross, mask4d,
            attention_mask=None)[0].numpy()

    ai = make_inputs(aparams, acfg, jnp.asarray(embeds),
                     jnp.asarray(mask, bool))
    block = jax.tree.map(lambda x: x[1], aparams["layers"])
    got = np.asarray(siglip._cross_attn_layer(
        block, jnp.asarray(hidden), ai, eps=1e-6, impl="xla"))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_adapter_export_loads_in_reference(tmp_path):
    """Round trip the OTHER direction: an adapter exported by this repo's
    save_adapter must load through the reference's own from_pretrained
    with identical weights."""
    import transformers

    from detikzify.model.adapter.modeling_adapter import (
        CrossAttentionAdapter,
    )

    from detikzify_tpu.config import AdapterConfig, VisionConfig
    from detikzify_tpu.models import adapter as adapter_mod
    from detikzify_tpu.models.load import save_adapter

    vcfg = VisionConfig(hidden_size=48, intermediate_size=96,
                        num_hidden_layers=2, num_attention_heads=4,
                        image_size=42, patch_size=14)
    acfg = AdapterConfig(embedding_hidden_size=32,
                         cross_attn_every_n_layers=2,
                         num_attention_heads=4)
    aparams = adapter_mod.init(jax.random.PRNGKey(3), vcfg, acfg,
                               dtype=jnp.float32)
    path = str(tmp_path / "ours")
    save_adapter(path, aparams, vcfg, active_every=2)

    vis_cfg = transformers.SiglipVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, image_size=42, patch_size=14,
        attn_implementation="eager")
    ref = CrossAttentionAdapter.from_pretrained(
        path, config=vis_cfg, input_hidden_size=32,
        cross_attn_every_n_layers=2)
    want = np.asarray(aparams["layers"]["attn"]["q"]["kernel"][1]).T
    got = ref.layers[1].cross_attn.q_proj.weight.detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    got_c = ref.connector.weight.detach().numpy()
    np.testing.assert_allclose(
        got_c, np.asarray(aparams["connector"]["kernel"]).T, atol=1e-6)


def test_full_model_export_loads_in_reference(ckpt, tmp_path):
    """Reverse full-model export gate (VERDICT round-2 directive #4): a
    checkpoint written by this repo's ``save_pretrained`` must load through
    the reference's own ``detikzify.model.load()``
    (reference model/__init__.py:28-45) and produce identical logits and
    greedy tokens. Any tensor-name or config-schema drift fails here."""
    import detikzify.model as ref_model_mod

    from detikzify_tpu.models.load import save_pretrained

    path = str(tmp_path / "export")
    save_pretrained(path, ckpt["params"], ckpt["our_cfg"],
                    processor=ckpt["our_proc"])
    exp_model, exp_proc = ref_model_mod.load(path, dtype=torch.float32)
    exp_model.eval()

    img = _figure()
    for text in ["", "\\draw (0,0)"]:
        exp_in = exp_proc(images=img, text=text, return_tensors="pt")
        our_in = ckpt["our_proc"](images=img, text=text)
        # processor artifacts round-tripped: same ids, same pixels
        assert exp_in["input_ids"][0].tolist() == \
            our_in.input_ids[0].tolist()
        np.testing.assert_allclose(
            exp_in["pixel_values"][0].numpy(),
            np.transpose(our_in.pixel_values[0], (2, 0, 1)), atol=1e-6)
        # logits of the reference-loaded EXPORT vs the original reference
        # model (weights round-tripped through our pytree + name mapping)
        with torch.inference_mode():
            want = ckpt["ref_model"](
                input_ids=exp_in["input_ids"],
                pixel_values=exp_in["pixel_values"]).logits.numpy()
            got = exp_model(
                input_ids=exp_in["input_ids"],
                pixel_values=exp_in["pixel_values"]).logits.numpy()
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
        # greedy decode through the reference generation loop on the
        # exported checkpoint vs our engine
        exp_ckpt = dict(ckpt, ref_model=exp_model)
        ref_tokens = _ref_greedy(exp_ckpt, exp_in["input_ids"],
                                 exp_in["pixel_values"], MAX_NEW)
        our_tokens = _our_greedy(ckpt, [int(t) for t in our_in.input_ids[0]],
                                 our_in.pixel_values, MAX_NEW)
        assert our_tokens == ref_tokens, \
            f"greedy tokens diverge on exported checkpoint for {text!r}"
