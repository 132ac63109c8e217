"""MCTS-driven TikZ generation against the TPU decode engine.

Search semantics match reference ``detikzify/infer/generate.py:145-353``
(progressive widening, line-boundary segmentation, failed-rollout caching,
error-line-bounded expansion, dynamic score normalization) but the execution
model is TPU-native:

  * rollouts run on ``DecodeEngine`` slots with **tree-prefix KV reuse** --
    a child rollout restores its deepest stored ancestor's KV and prefills
    only the tail, instead of re-prefilling image + prompt + prefix every
    time (the reference's dominant cost, SURVEY §3.3);
  * LaTeX compiles run through the async ``CompileService`` worker pool;
  * SelfSim scoring is a jitted batched encoder pass (``evaluate.imagesim``).
"""
from __future__ import annotations

import concurrent.futures as _cf
import dataclasses
import itertools
import time
from collections import deque
from math import sqrt
from typing import Dict, Generator, List, Optional, Tuple

import numpy as np

from ..engine import DecodeEngine
from ..mcts import MonteCarlo, Node, Normalizer
from ..ops.sampling import make_newline_table
from ..processing import DetikzifyProcessor
from ..utils.functools import cache_cast
from .tikz import CompileService, TikzDocument

Numeric = float

#: Yielded by ``simulate(..., shared_engine=True)`` when the search cannot
#: make progress because OTHER users of the shared engine hold every slot
#: (paused sibling searches in a timesliced scheduler). The scheduler must
#: advance its other tasks -- their turns are what release the slots this
#: search is waiting for. Never yielded from an exclusively-owned engine.
STALLED = object()


@dataclasses.dataclass(frozen=True)
class NodeState:
    token_ids: Tuple[int, ...]
    num_lines: int = 0

    def __eq__(self, other):
        return (isinstance(other, NodeState)
                and self.token_ids == other.token_ids)

    def __hash__(self):
        return hash(self.token_ids)


class WideNode(Node):
    """Node with progressive widening: every real node carries a paired
    widen-node child, a standing arm that means "sample a fresh rollout
    from this state" (reference ``WideNode``, generate.py:49-82)."""

    def __init__(self, state: NodeState, exploration: float = 0.6,
                 is_widen_node: bool = False):
        super().__init__(state, exploration)
        self.is_widen_node = is_widen_node
        # full token sequence of the rollout this node was cut from: the
        # suffix beyond the node's own prefix is REFERENCE TEXT for
        # speculative draft lookup in child rollouts (engine hints)
        self.rollout_tokens: Optional[Tuple[int, ...]] = None
        self.update_policy_value(1.0)
        if not is_widen_node:
            self.add_child(WideNode(state, exploration, is_widen_node=True))

    def add_child(self, child: "Node") -> None:
        self.expanded = self.expanded or not child.is_widen_node
        super().add_child(child)

    @property
    def token_ids(self) -> Tuple[int, ...]:
        return self.state.token_ids

    @property
    def num_lines(self) -> int:
        return self.state.num_lines


from ..utils.generation import ExplicitAbort  # noqa: E402  (re-export)


_gen_counter = itertools.count()


class DetikzifyGenerator:
    """One image/text -> TikZ search session."""

    def __init__(
        self,
        engine: DecodeEngine,
        processor: DetikzifyProcessor,
        image=None,                     # preprocessed PIL image or None
        text: Optional[str] = None,
        metric=None,                    # ImageSim-like or None (fast mode)
        compile_timeout: float = 60.0,
        mcts_timeout: Optional[float] = None,
        exploration: float = 0.6,
        strict: bool = False,
        control: Optional[ExplicitAbort] = None,
        compile_service: Optional[CompileService] = None,
        max_length: Optional[int] = None,
        max_new_tokens: Optional[int] = None,
        on_token=None,                  # per-token streaming callback
        adapter=None,                   # AdapterBundle for text conditioning
        sampling=None,                  # SamplingParams override (per-call)
        on_tick=None,                   # per-iteration scheduler hook
        image_embeds=None,              # precomputed [1, N, D] projected
        # image tokens (fused sampling waves batch ONE vision pass for the
        # whole wave and hand each generator its slice)
    ):
        self.engine = engine
        self.processor = processor
        self.image = image
        self.text = text
        self.metric = metric
        self.compile_timeout = compile_timeout
        self.mcts_timeout = mcts_timeout
        self.exploration = exploration
        self.strict = strict
        self.control = control or ExplicitAbort()
        self.compiler = compile_service or CompileService(
            timeout=compile_timeout)
        self._own_compiler = compile_service is None
        self.on_token = on_token
        self.sampling = sampling        # None -> engine defaults
        # host-side scheduler hook, called once per search-loop iteration:
        # a serving layer interleaves queued one-shot sampling work into
        # free engine slots between this search's engine.step() ticks
        # (serve.InferenceServer). Exceptions are the hook owner's to
        # contain -- an escape aborts the search.
        self.on_tick = on_tick
        # wave-scoring capability, computed ONCE (the metric object is
        # fixed for this generator's lifetime; _dispatch_scores runs
        # every completion wave on the 1-core host driving the engine):
        # batched scoring needs score_against_async, and text-conditioned
        # (TikZero) searches additionally need its `text` kwarg --
        # duck-typed metrics without it keep the per-call score() path.
        self._wave_scoring_ok = hasattr(metric, "score_against_async")
        if self._wave_scoring_ok and text is not None:
            import inspect

            try:
                sig = inspect.signature(metric.score_against_async)
                self._wave_scoring_ok = "text" in sig.parameters
            except (TypeError, ValueError):
                self._wave_scoring_ok = False
        # live concurrency target for _simulate_parallel: re-read EVERY
        # loop iteration, so a scheduler sharing the engine between
        # searches can grow/shrink each search's slot share mid-flight
        self.parallelism = 1
        self.namespace = ("gen", next(_gen_counter))

        import jax.numpy as jnp

        if text is not None and adapter is None:
            raise ValueError("textual inputs require an adapter bundle")
        # Root prompt mirrors reference generate.py:178-186: image tokens
        # only (no BOS). TikZero+ (model_expects_text) additionally appends
        # the caption + a BOS separator to the prompt.
        expects_text = getattr(processor, "model_expects_text", False)
        prompt_text = text if (text is not None and expects_text) else None
        out = processor(images=image if image is not None else None,
                        text=prompt_text if image is not None else
                        (prompt_text or ""),
                        add_bos_token=prompt_text is not None,
                        # embeds already computed (e.g. the fused serving
                        # wave's shared vision pass): ids only, skip the
                        # host resize+normalize the reference would redo
                        skip_pixels=image_embeds is not None)
        root_ids = tuple(int(t) for t in out.input_ids[0])
        self.max_length = min(max_length or processor.model_max_length,
                              engine.max_len - 1)
        self.adapter = adapter

        adapter_inputs = None
        pixel_values = out.pixel_values
        if text is not None:
            adapter_inputs = adapter.adapter_inputs([text])
            if pixel_values is None:
                # text-only generation: the adapter's learnable blank image
                from ..models.adapter import dummy_pixels

                pixel_values = dummy_pixels(adapter.adapter_params, 1)
                root_ids = tuple(
                    [processor.image_token_id] * processor.image_seq_len
                    + list(root_ids))

        if max_new_tokens is not None:
            # reference generate() semantics: cap NEW tokens past the prompt
            # (root_ids is final here -- text-only prompts prepend image
            # tokens above)
            self.max_length = min(self.max_length,
                                  len(root_ids) + max_new_tokens)

        self.image_embeds = image_embeds
        if self.image_embeds is None and pixel_values is not None:
            self.image_embeds = engine.encode_image(
                jnp.asarray(pixel_values), adapter_inputs=adapter_inputs)

        self.solution: deque = deque(maxlen=1)
        self.failed_rollouts: Dict[NodeState, List[WideNode]] = {}
        self.norm = Normalizer()
        self.montecarlo = MonteCarlo(
            WideNode(NodeState(root_ids, 0), exploration=exploration))
        self.montecarlo.child_finder = self.child_finder

        self._newline = self._build_newline_table()
        self._pending_rollout = None    # engine Rollout awaiting prefix save

        self.decode = cache_cast(lambda ids: tuple(ids))(self.decode)
        self.score = cache_cast(lambda img: img.tobytes())(self.score)

        # observability (SURVEY §5): per-rollout timing + token counts
        self.stats = {"rollouts": 0, "rollout_tokens": 0,
                      "rollout_time": 0.0, "compile_time": 0.0,
                      "score_time": 0.0, "prefix_hits": 0,
                      "prefix_tokens_saved": 0,
                      # parallel-loop wall-time phase split (observability
                      # for the rollouts/min budget; all host-side clocks)
                      "t_launch": 0.0, "t_step": 0.0, "t_resolve": 0.0,
                      "t_complete": 0.0, "t_dispatch": 0.0, "t_wait": 0.0,
                      # terminal leaf revisits (selection landed on a state
                      # with nothing left to decode: EOS / max_length) and
                      # wave renders skipped because their score was
                      # already memoized -- both near-free re-streams
                      "terminal_revisits": 0, "score_memo_hits": 0,
                      # loop iterations where decode ran WHILE compile or
                      # score work was pending, and the peak expansions in
                      # flight across all stages: evidence the stages
                      # pipeline (max_inflight > parallelism iff decode
                      # refilled during a compile/score window)
                      "overlap_ticks": 0, "max_inflight": 0}

    def close(self) -> None:
        self.engine.drop_namespace(self.namespace)
        if self._own_compiler:
            self.compiler.shutdown()

    # ------------------------------------------------------------------

    def _build_newline_table(self):
        tok = self.processor.tokenizer
        cached = getattr(tok, "_detikzify_newline_table", None)
        if cached is not None:
            return cached
        vocab_size = getattr(tok, "vocab_size", None) or len(tok.get_vocab())
        counts, ends = make_newline_table(tok, vocab_size)
        table = {i: (int(counts[i]), bool(ends[i]))
                 for i in np.nonzero(counts)[0]}
        try:
            tok._detikzify_newline_table = table  # one scan per tokenizer
        except AttributeError:
            pass
        return table

    @property
    def root(self) -> WideNode:
        return self.montecarlo.root_node  # type: ignore[return-value]

    # ------------------------------------------------------------------
    # rollout: stream tokens from the engine, yield line-boundary prefixes
    # ------------------------------------------------------------------

    @staticmethod
    def _record_rollout_tokens(new_nodes, origin=None) -> None:
        """Record the full rollout on each node cut from it AND on the
        node it was rolled out from (``origin`` -- e.g. the root, which is
        never itself cut from a rollout but re-samples from its own state
        constantly): the suffix beyond a node's prefix becomes the
        speculative draft hint for its future child rollouts (sequential
        and parallel paths share this)."""
        if not new_nodes:
            return
        full = new_nodes[-1].token_ids
        for n in new_nodes:
            if n.rollout_tokens is None:
                n.rollout_tokens = full
        if origin is not None:
            o = origin.parent if origin.is_widen_node else origin
            if o is not None and o.rollout_tokens is None:
                o.rollout_tokens = full

    def _hint_for(self, node) -> Optional[Tuple[int, ...]]:
        """Reference text for speculative draft lookup: the suffix of the
        rollout this node was cut from (child rollouts re-generate much of
        the parent's continuation). None when the engine is not
        speculative or no source rollout is recorded."""
        # duck-typed engines (test doubles) may not expose `spec`
        if getattr(self.engine, "spec", 0) <= 0 or node is None:
            return None
        n = node.parent if getattr(node, "is_widen_node", False) else node
        full = getattr(n, "rollout_tokens", None)
        ids = n.token_ids
        if full and len(full) > len(ids) and full[:len(ids)] == tuple(ids):
            return full[len(ids):]
        return None

    def rollout(self, state: NodeState, hint=None
                ) -> Generator[Tuple[Tuple[int, ...], int], None, None]:
        ids = list(state.token_ids)
        eos = self.engine.eos_token_id
        if (ids and ids[-1] == eos) or len(ids) >= self.max_length:
            return  # terminal state: nothing to extend

        if self.control.should_stop:
            # aborted before this rollout even started (e.g. an HTTP client
            # disconnected between scheduling and execution): don't touch
            # the engine.  Deliberately NOT reset here -- an abort must be
            # sticky for the whole search; owners that reuse a control
            # across searches reset it themselves (webui.py:198).
            return

        t0 = time.time()
        found = self.engine.best_prefix(ids, namespace=self.namespace)
        prefix = found[1] if found else None
        if prefix is not None:
            self.stats["prefix_hits"] += 1
            self.stats["prefix_tokens_saved"] += prefix.length

        # pass `hint` only when set: duck-typed engine doubles predate it
        hint_kw = {} if hint is None else {"hint": hint}
        ro = self.engine.start(
            ids, image_embeds=self.image_embeds,
            max_new_tokens=self.max_length - len(ids),
            prefix=prefix, on_token=self.on_token, lazy=True,
            sampling=self.sampling, **hint_kw)
        self._pending_rollout = ro

        boundary: List[int] = list(ids)   # cumulative prefix at last boundary
        line: List[int] = []
        num_lines, continuation = state.num_lines, False
        processed = len(ids)
        try:
            while True:
                for tok in ro.token_ids[processed:]:
                    line.append(tok)
                    info = self._newline.get(tok)
                    if info:
                        n, trailing = info
                        num_lines += n - continuation
                        continuation = not trailing
                        boundary = boundary + line
                        line = []
                        yield tuple(boundary), num_lines
                processed = len(ro.token_ids)
                if ro.finished:
                    break
                if self.control.should_stop:
                    self.engine.abort(ro)
                self.engine.step()
            if line:
                yield tuple(boundary + line), num_lines - continuation
        except GeneratorExit:
            self.control.abort()
            self.engine.abort(ro)
            while not ro.finished:
                self.engine.step()
            raise
        finally:
            self.stats["rollouts"] += 1
            self.stats["rollout_tokens"] += ro.new_tokens
            self.stats["rollout_time"] += time.time() - t0

    # ------------------------------------------------------------------

    def decode(self, token_ids) -> TikzDocument:
        code = self.processor.decode(
            list(token_ids)[len(self.root.token_ids):],
            skip_special_tokens=True)
        return TikzDocument(code, timeout=self.compile_timeout,
                            backend=self.compiler.backend)

    def score(self, image) -> Numeric:
        assert self.metric is not None
        t0 = time.time()
        try:
            value = float(self.metric.score(img1=image, img2=self.image,
                                            text2=self.text))
        except TypeError:   # custom metrics without text support
            value = float(self.metric.score(image, self.image))
        self.stats["score_time"] += time.time() - t0
        return value

    def sample(self) -> TikzDocument:
        """One-shot sampling (no tree search)."""
        it = self.sample_iter()
        while True:
            try:
                next(it)
            except StopIteration as stop:
                return stop.value

    def sample_iter(self) -> Generator[None, None, TikzDocument]:
        """Incremental ``sample()``: yields after every engine decode
        dispatch (one ``decode_block``-bounded chunk of host work per
        ``next()``) and returns the finished TikzDocument as the
        generator's StopIteration value. The serving scheduler drives
        this in bounded chunks so a long sampling wave cannot starve
        concurrent MCTS searches' host loops (serve._SampleWave);
        ``close()``-ing mid-decode aborts the rollout like the MCTS
        rollout path does."""
        ids = list(self.root.token_ids)
        eos = self.engine.eos_token_id
        if ((ids and ids[-1] == eos) or len(ids) >= self.max_length
                or self.control.should_stop):
            return self.decode(tuple(ids))      # nothing to extend

        t0 = time.time()
        found = self.engine.best_prefix(ids, namespace=self.namespace)
        prefix = found[1] if found else None
        if prefix is not None:
            self.stats["prefix_hits"] += 1
            self.stats["prefix_tokens_saved"] += prefix.length
        ro = self.engine.start(
            ids, image_embeds=self.image_embeds,
            max_new_tokens=self.max_length - len(ids),
            prefix=prefix, on_token=self.on_token, lazy=True,
            sampling=self.sampling)
        self._pending_rollout = ro
        try:
            while not ro.finished:
                if self.control.should_stop:
                    self.engine.abort(ro)
                self.engine.step()
                yield
        except GeneratorExit:
            self.control.abort()
            self.engine.abort(ro)
            while not ro.finished:
                self.engine.step()
            self._finish_rollout([])     # release the aborted slot
            raise
        finally:
            self.stats["rollouts"] += 1
            self.stats["rollout_tokens"] += ro.new_tokens
            self.stats["rollout_time"] += time.time() - t0
        doc = self.decode(tuple(ro.token_ids))
        self._finish_rollout([])
        return doc

    # ------------------------------------------------------------------
    # MCTS expansion policy (semantics: reference generate.py:305-353)
    # ------------------------------------------------------------------

    def child_finder(self, node: WideNode, montecarlo: MonteCarlo) -> None:
        new_nodes: List[WideNode] = []
        rollout_gen = self.rollout(node.state, hint=self._hint_for(node))
        for token_ids, num_lines in rollout_gen:
            new_node = WideNode(NodeState(token_ids, num_lines),
                                exploration=self.exploration)
            if new_node.state in self.failed_rollouts:
                # replay a known-failing suffix instead of regenerating
                new_nodes.extend(self.failed_rollouts[new_node.state])
                rollout_gen.close()
                break
            new_nodes.append(new_node)
        if not new_nodes and self.control.should_stop:
            # the rollout was aborted before producing anything: don't
            # compile/score the parent node as if it were a fresh rollout
            # (a genuinely terminal state still falls through below)
            return
        self._record_rollout_tokens(new_nodes, origin=node)

        if node.is_widen_node:
            node.visits += 1
            node, new_nodes = self._merge(node.parent, new_nodes)

        t0 = time.time()
        tikz = self.decode((new_nodes or [node])[-1].token_ids)
        tikz.compile()
        self.stats["compile_time"] += time.time() - t0

        attached = self._attach(node, new_nodes, tikz)
        self._finish_rollout(attached)
        self._score_and_backprop(attached[-1] if attached else node, tikz)

    def _attach(self, node: WideNode, new_nodes: List[WideNode],
                tikz: TikzDocument) -> List[WideNode]:
        """Attach rollout prefixes to the tree given the compile outcome
        (reference generate.py:320-335). Returns the attached chain."""
        skip_idx = round(sqrt(len(new_nodes)))
        scorable = tikz.is_rasterizable and not (
            self.strict and tikz.compiled_with_errors)
        attached: List[WideNode] = []
        if scorable:
            for new_node in new_nodes[:skip_idx]:
                node.add_child(new_node)
                node = new_node
                attached.append(new_node)
        else:
            errorln = min(tikz.errors or [0])
            if errorln:
                # attach only prefixes strictly before the error line; cache
                # the failing suffix so future rollouts skip regeneration
                for idx, new_node in enumerate(new_nodes):
                    # reference generate.py:330-333 also tests
                    # ``num_lines == errorln and newlineinfo.get(ids[-1])``
                    # -- but its token_ids are torch TENSORS, so the
                    # int-keyed dict lookup always misses and that clause is
                    # effectively dead in the reference runtime. Mirror the
                    # EFFECTIVE semantics (verified live by the scripted
                    # trace-parity test): cache the failing suffix only once
                    # a node lies strictly beyond the error line.
                    if new_node.num_lines < errorln and idx < skip_idx:
                        node.add_child(new_node)
                        node = new_node
                        attached.append(new_node)
                    elif new_node.num_lines > errorln:
                        self.failed_rollouts[new_node.state] = new_nodes[idx:]
                        break
        return attached

    def _score_and_backprop(self, node: WideNode, tikz: TikzDocument,
                            precomputed: Optional[float] = None) -> Numeric:
        scorable = tikz.is_rasterizable and not (
            self.strict and tikz.compiled_with_errors)
        if self.metric is not None:
            if scorable:
                score = (precomputed if precomputed is not None
                         else self.score(tikz.rasterize()))
            else:
                score = -1
            node.update_win_value(self.norm(score) if scorable else score)
        else:
            # fast mode: compiler diagnostics in {-1, 0, 1}
            score = int(scorable) - int(tikz.compiled_with_errors)
            node.update_win_value(score)
        self.solution.append((score, tikz))
        return score

    def _merge(self, node: WideNode, nodes_to_merge: List[WideNode]
               ) -> Tuple[WideNode, List[WideNode]]:
        """Fold a widen-node rollout into existing children where states
        already exist (reference generate.py:345-353)."""
        for merge_node in nodes_to_merge:
            for child in node.children:
                if child.state == merge_node.state:
                    node, nodes_to_merge = child, nodes_to_merge[1:]
                    break
            else:
                break
        return node, nodes_to_merge

    def _store_prefixes_for(self, ro, nodes: List[WideNode]) -> List[tuple]:
        """Store KV prefixes (rollout prompt + candidate tree nodes) from a
        live slot. This is what makes child expansions re-prefill only
        tails; the root image+prompt prefill is computed once per figure.
        Returns the candidate-node keys NEWLY stored by this call (so the
        parallel path can evict candidates that end up unattached)."""
        prompt_ids = tuple(ro.token_ids[:ro.prompt_len])
        self.engine.store_prefix((self.namespace, prompt_ids), ro,
                                 length=ro.prompt_len,
                                 namespace=self.namespace)
        new_keys = []
        for new_node in nodes:
            n = len(new_node.token_ids)
            if (n <= ro.length
                    and tuple(ro.token_ids[:n]) == new_node.token_ids):
                key = (self.namespace, new_node.state)
                if self.engine.has_prefix(key):
                    continue    # stored by an earlier rollout: not ours
                if self.engine.store_prefix(key, ro, length=n,
                                            namespace=self.namespace):
                    new_keys.append((key, new_node.state))
        return new_keys

    def _finish_rollout(self, attached: List[WideNode]) -> None:
        ro = self._pending_rollout
        self._pending_rollout = None
        if ro is None:
            return
        self._store_prefixes_for(ro, attached)
        self.engine.release(ro)

    # ------------------------------------------------------------------

    def simulate(self, expansions: Optional[float] = 1,
                 parallelism: int = 1, *, shared_engine: bool = False
                 ) -> Generator[Tuple[Numeric, TikzDocument], None, None]:
        """Run MCTS expansions, yielding every rollout's (score, document).

        ``parallelism > 1`` runs that many expansions concurrently on the
        engine's slots (virtual loss diversifies selection; LaTeX compiles
        overlap decode through the async pool) -- the TPU-native fast path
        for MCTS rollouts/min. ``parallelism=1`` preserves the reference's
        strictly sequential search order.

        ``shared_engine=True`` (timesliced schedulers: serve.py) always
        uses the staged parallel loop -- even at parallelism=1 -- because
        it is the only path whose launch guards tolerate sibling searches
        holding slots (the sequential path's ``engine.start`` raises on a
        full engine) and the only one that re-reads ``self.parallelism``
        live for rebalancing. It may also yield the ``STALLED`` sentinel
        instead of a result when every slot is held by paused siblings;
        the scheduler must then advance its other tasks."""
        if shared_engine:
            yield from self._simulate_parallel(expansions, parallelism,
                                               shared=True)
            return
        if parallelism > 1:
            for out in self._simulate_parallel(expansions, parallelism):
                if out is not STALLED:  # impossible on an exclusive engine
                    yield out
            return
        start = time.time()
        budget = expansions
        while budget is None or (budget := budget - 1) >= 0:
            if self.on_tick is not None:
                self.on_tick()
            self.montecarlo.simulate()
            if self.solution:
                yield self.solution.pop()
            if self.control.should_stop:
                # the whole SEARCH stops, not just the in-flight rollout
                # (reference raises InterruptedError, generate.py:278-280);
                # the flag is sticky -- rollout() never resets it -- so an
                # abort landing between rollouts cannot be lost
                return
            if (self.mcts_timeout is not None
                    and time.time() - start > self.mcts_timeout):
                return

    __call__ = simulate

    # ------------------------------------------------------------------
    # parallel MCTS: K concurrent expansions over engine slots
    # ------------------------------------------------------------------

    class _Expansion:
        __slots__ = ("node", "path", "ro", "boundary", "line", "num_lines",
                     "continuation", "processed", "new_nodes", "stopped",
                     "future", "t0", "prompt", "prefix", "stored_keys",
                     "hint")

        def __init__(self, node, path):
            self.node = node
            self.path = path
            self.ro = None
            self.new_nodes: List = []
            self.stopped = False
            self.future = None
            self.t0 = time.time()
            self.prompt = None      # token ids to roll out from (None=leaf)
            self.prefix = None      # StoredPrefix to restore, if any
            self.hint = None        # speculative draft reference text
            self.stored_keys: List = []   # speculative prefix stores

    def _select_leaf(self) -> WideNode:
        node = self.montecarlo.root_node
        while node.expanded:
            node = node.get_preferred_child(self.montecarlo.root_node)
        return node  # type: ignore[return-value]

    def _virtual_loss(self, node) -> list:
        """Temporarily inflate visit counts along the path so concurrent
        selections diversify; reverted before the real backprop."""
        path = []
        n = node
        while n is not None:
            n.visits += 1
            path.append(n)
            n = n.parent
        return path

    def _prepare_expansion(self) -> "_Expansion":
        """Select a leaf (with virtual loss) and resolve its rollout prompt
        + stored prefix, WITHOUT starting it: waves of prepared expansions
        launch together through one fused burst start."""
        node = self._select_leaf()
        exp = self._Expansion(node, self._virtual_loss(node))
        ids = list(node.state.token_ids)
        eos = self.engine.eos_token_id
        if (ids and ids[-1] == eos) or len(ids) >= self.max_length:
            return exp  # terminal: no rollout, straight to compile
        found = self.engine.best_prefix(ids, namespace=self.namespace)
        prefix = found[1] if found else None
        if prefix is not None:
            self.stats["prefix_hits"] += 1
            self.stats["prefix_tokens_saved"] += prefix.length
        exp.prompt = ids
        exp.prefix = prefix
        exp.hint = self._hint_for(node)
        return exp

    def _launch_wave(self, wave: List["_Expansion"]) -> None:
        """Start a wave of prepared expansions as fused burst programs (one
        dispatch per power-of-two chunk instead of one per expansion)."""
        hints = [exp.hint for exp in wave]
        hint_kw = {} if all(h is None for h in hints) else {"hints": hints}
        ros = self.engine.start_many(
            [exp.prompt for exp in wave],
            image_embeds=self.image_embeds,
            max_new_tokens=[self.max_length - len(exp.prompt)
                            for exp in wave],
            prefixes=[exp.prefix for exp in wave],
            sampling=self.sampling, on_token=self.on_token, **hint_kw)
        for exp, ro in zip(wave, ros):
            exp.ro = ro
            exp.boundary = list(exp.prompt)
            exp.line = []
            exp.num_lines = exp.node.state.num_lines
            exp.continuation = False
            exp.processed = len(exp.prompt)

    def _advance_segmentation(self, exp: "_Expansion") -> None:
        """Consume newly decoded tokens, cutting nodes at line boundaries
        (same semantics as ``rollout``), replaying failed suffixes."""
        ro = exp.ro
        for tok in ro.token_ids[exp.processed:]:
            exp.processed += 1
            if exp.stopped:
                continue
            exp.line.append(tok)
            info = self._newline.get(tok)
            if not info:
                continue
            n, trailing = info
            exp.num_lines += n - exp.continuation
            exp.continuation = not trailing
            exp.boundary = exp.boundary + exp.line
            exp.line = []
            new_node = WideNode(
                NodeState(tuple(exp.boundary), exp.num_lines),
                exploration=self.exploration)
            if new_node.state in self.failed_rollouts:
                exp.new_nodes.extend(self.failed_rollouts[new_node.state])
                exp.stopped = True
                self.engine.abort(ro)
            else:
                exp.new_nodes.append(new_node)

    def _finalize_rollout(self, exp: "_Expansion") -> None:
        """Rollout finished: cut the trailing segment, store candidate KV
        prefixes, free the slot, enqueue the (async) compile."""
        ro = exp.ro
        if not exp.stopped and exp.line:
            exp.new_nodes.append(WideNode(
                NodeState(tuple(exp.boundary + exp.line),
                          exp.num_lines - exp.continuation),
                exploration=self.exploration))
        self.stats["rollouts"] += 1
        self.stats["rollout_tokens"] += ro.new_tokens
        self.stats["rollout_time"] += time.time() - exp.t0
        self._record_rollout_tokens(exp.new_nodes, origin=exp.node)
        # prefix candidates: only the first sqrt(n) nodes can be attached.
        # Stored SPECULATIVELY (the slot must be freed before the async
        # compile resolves); _complete_expansion drops whatever ends up
        # unattached, matching the sequential path's attached-only stores.
        skip_idx = round(sqrt(len(exp.new_nodes)))
        exp.stored_keys = self._store_prefixes_for(
            ro, exp.new_nodes[:skip_idx])
        self.engine.release(ro)
        tikz = self.decode(
            (exp.new_nodes or [exp.node])[-1].token_ids)
        exp.future = self.compiler.submit_doc(tikz)

    def _complete_expansion(self, exp: "_Expansion",
                            precomputed: Optional[float] = None
                            ) -> Tuple[Numeric, TikzDocument]:
        tikz = exp.future.result()
        for n in exp.path:
            n.visits -= 1           # revert virtual loss
        node, new_nodes = exp.node, exp.new_nodes
        if node.is_widen_node:
            node.visits += 1
            node, new_nodes = self._merge(node.parent, new_nodes)
        attached = self._attach(node, new_nodes, tikz)
        # evict speculative prefix stores for candidates that did NOT get
        # attached (sequential path stores attached-only) -- keeps pool
        # pressure identical between the two modes
        attached_states = {n.state for n in attached}
        for key, state in exp.stored_keys:
            if state not in attached_states:
                self.engine.drop_prefix(key)
        if exp.node.children:
            exp.node.expanded = True
        # mirror MonteCarlo.expand bookkeeping (sequential path)
        self.montecarlo.stats_expansion_count += 1
        if not exp.node.children:
            self.montecarlo.stats_failed_expansion_count += 1
        if self.montecarlo.on_expansion is not None:
            self.montecarlo.on_expansion(exp.node)
        score = self._score_and_backprop(
            attached[-1] if attached else node, tikz,
            precomputed=precomputed)
        if self.solution:
            self.solution.pop()
        return score, tikz

    def _dispatch_scores(self, exps: list):
        """Rasterize one completion wave's scorable renders and DISPATCH a
        single batched encoder pass over them (SelfSim cost amortizes
        across expansions). Returns a pending handle for
        ``_resolve_scores`` or None when the wave has nothing to batch.
        Only the device program is enqueued here; the drive loop keeps
        dispatching decode steps behind it and fetches the result one
        iteration later, so scoring overlaps decode -- and, in the
        trickling endgame where compiles land one at a time, each
        single-render score runs on device behind the NEXT compile's
        latency window instead of stalling the loop. Text-conditioned
        (TikZero) searches batch too: only the REFERENCE embedding is
        caption-conditioned (renders never are, matching ``score()``),
        and ``ImageSim.features`` LRU-caches it per (image, text) -- so
        wave scores are identical to the per-call path while paying one
        encoder dispatch per wave instead of per render.

        The batch is ALSO memo-aware, sharing the sequential path's
        ``self.score`` cache (reference generate.py:192 memoizes score on
        image bytes, so terminal leaf revisits re-streaming an
        already-generated program cost nothing): renders whose bytes are
        already cached are skipped here -- ``_complete_expansion``'s
        fallback ``self.score`` call hits the memo -- in-wave duplicate
        renders encode once, and resolved values are written back into
        the memo so steady-state revisits never re-encode."""
        if self.metric is None or not exps or not self._wave_scoring_ok:
            return None
        memo = getattr(self.score, "cache", None)
        imgs, keys, img_bytes = [], [], []
        seen: Dict[bytes, List[int]] = {}   # in-wave dedup: bytes -> exps
        for exp in exps:
            doc = exp.future.result()
            if doc.is_rasterizable and not (self.strict
                                            and doc.compiled_with_errors):
                img = doc.rasterize()
                if img is not None:
                    b = img.tobytes()
                    if memo is not None and b in memo:
                        self.stats["score_memo_hits"] += 1
                        continue    # completion falls back to the memo
                    if b in seen:
                        seen[b].append(id(exp))
                        continue    # encoded once per distinct render
                    seen[b] = [id(exp)]
                    imgs.append(img)
                    keys.append(id(exp))
                    img_bytes.append(b)
        if not imgs:
            return None
        t0 = time.time()
        # one bucketed encoder pass for the whole wave; reference features
        # come from the metric's LRU (encoded once per search)
        if self.text is not None:
            dev, k = self.metric.score_against_async(imgs, self.image,
                                                     text=self.text)
        else:
            dev, k = self.metric.score_against_async(imgs, self.image)
        self.stats["score_time"] += time.time() - t0
        return dev, k, keys, img_bytes, seen

    def _resolve_scores(self, pending) -> dict:
        """Fetch the batched wave scores dispatched by _dispatch_scores."""
        if pending is None:
            return {}
        dev, k, keys, img_bytes, seen = pending
        t0 = time.time()
        vals = np.asarray(dev)[:k]
        self.stats["score_time"] += time.time() - t0
        memo = getattr(self.score, "cache", None)
        out = {}
        for key, b, v in zip(keys, img_bytes, vals):
            v = float(v)
            if memo is not None:
                memo[b] = v         # future revisits hit the memo
            for dup_key in seen[b]:
                out[dup_key] = v    # in-wave duplicates share the value
        return out

    def _simulate_parallel(self, expansions: Optional[float],
                           parallelism: int, shared: bool = False
                           ) -> Generator[Tuple[Numeric, TikzDocument],
                                          None, None]:
        start = time.time()
        target = expansions
        self.parallelism = max(1, min(parallelism, self.engine.num_slots))
        launched = completed = 0
        decoding: List = []
        compiling: List = []
        scoring: List = []      # [(exps, pending)] score-dispatched waves

        def timed_out() -> bool:
            return (self.mcts_timeout is not None
                    and time.time() - start > self.mcts_timeout)

        try:
            while target is None or completed < target:
                if self.on_tick is not None:
                    self.on_tick()
                # live re-read: a scheduler may rebalance slot shares
                parallelism = max(1, min(self.parallelism,
                                         self.engine.num_slots))
                t_ph = time.time()
                wave: List = []
                # ``parallelism`` bounds concurrent DECODING rollouts
                # (device occupancy). Expansions sitting in the compile or
                # score stage do NOT hold a decode slot, so new rollouts
                # refill the engine while LaTeX runs -- decode pipelines
                # behind compile in steady state. Total in-flight
                # expansions are capped at 2x parallelism to bound
                # virtual-loss staleness in the tree.
                n_scoring = sum(len(e) for e, _ in scoring)
                while ((target is None or launched < target)
                       and len(decoding) + len(wave) < parallelism
                       and len(decoding) + len(compiling) + n_scoring
                       + len(wave) < 2 * parallelism
                       and self.engine.num_active + len(wave)
                       < self.engine.num_slots
                       # free-slot guard: when a scheduler shares the
                       # engine between searches/sampling, a PAUSED
                       # sibling's finished-but-unreleased rollouts hold
                       # slots while inactive -- launching past the free
                       # count would raise in start_many
                       and len(wave) < self.engine.num_free_slots
                       and not timed_out()
                       and not self.control.should_stop):
                    exp = self._prepare_expansion()
                    launched += 1
                    if exp.prompt is None:      # terminal state
                        self.stats["terminal_revisits"] += 1
                        doc = self.decode(exp.node.token_ids)
                        if "output" in doc.__dict__:
                            # revisit of an already-compiled program (the
                            # decode memo returned the same document):
                            # skip the compile-pool round trip -- with the
                            # score memo the whole expansion is host-only
                            fut: _cf.Future = _cf.Future()
                            fut.set_result(doc)
                            exp.future = fut
                        else:
                            exp.future = self.compiler.submit_doc(doc)
                        compiling.append(exp)
                    else:
                        wave.append(exp)
                if wave:
                    self._launch_wave(wave)
                    decoding.extend(wave)
                self.stats["t_launch"] += time.time() - t_ph
                self.stats["max_inflight"] = max(
                    self.stats["max_inflight"],
                    len(decoding) + len(compiling) + n_scoring)

                if decoding:
                    if compiling or scoring:
                        self.stats["overlap_ticks"] += 1
                    t_ph = time.time()
                    self.engine.step()
                    for exp in list(decoding):
                        self._advance_segmentation(exp)
                        if exp.ro.finished:
                            self._finalize_rollout(exp)
                            decoding.remove(exp)
                            compiling.append(exp)
                    self.stats["t_step"] += time.time() - t_ph

                # resolve score waves dispatched on a PREVIOUS iteration:
                # their device program has been running behind this
                # iteration's decode dispatch, so the fetch overlaps decode.
                # While decode/compile work remains, only fetch results that
                # are already materialized (is_ready) -- the compile-latency
                # waits below then absorb the scoring round trip instead of
                # stacking on top of it.
                while scoring:
                    exps_w, pending = scoring[0]
                    if (decoding or compiling) and pending is not None:
                        dev = pending[0]
                        if hasattr(dev, "is_ready") and not dev.is_ready():
                            break
                    t_ph = time.time()
                    wave_scores = self._resolve_scores(pending)
                    self.stats["t_resolve"] += time.time() - t_ph
                    while exps_w:
                        exp = exps_w.pop(0)
                        completed += 1
                        t_ph = time.time()
                        out = self._complete_expansion(
                            exp, precomputed=wave_scores.get(id(exp)))
                        self.stats["t_complete"] += time.time() - t_ph
                        yield out
                    scoring.pop(0)

                t_ph = time.time()
                ready = [exp for exp in compiling if exp.future.done()]
                if ready:
                    for exp in ready:
                        compiling.remove(exp)
                    pending = self._dispatch_scores(ready)
                    self.stats["t_dispatch"] += time.time() - t_ph
                    if pending is None:
                        # unbatchable wave (no metric / text-conditioned /
                        # nothing rasterizable): complete in place
                        for exp in ready:
                            completed += 1
                            t_ph = time.time()
                            out = self._complete_expansion(exp)
                            self.stats["t_complete"] += time.time() - t_ph
                            yield out
                    else:
                        scoring.append((ready, pending))

                if timed_out() or self.control.should_stop:
                    break
                if (not decoding and not compiling and not scoring
                        and launched >= (target or 0)
                        and target is not None):
                    break
                if not decoding and not compiling and not scoring:
                    # nothing in flight and the launch loop produced
                    # nothing (and the search is not done): every slot is
                    # held by OTHER users of a shared engine -- paused
                    # sibling searches whose slots only free on THEIR
                    # scheduler turns. Spinning here would wedge the
                    # single scheduler thread forever (the siblings never
                    # run); hand control back instead.
                    time.sleep(0.001)
                    if shared:
                        yield STALLED
                    continue
                if not decoding and compiling:
                    # nothing to decode; block briefly until ANY pending
                    # compile lands (waiting on the oldest alone can idle
                    # a full poll interval past a younger one that already
                    # finished -- real latexmk latencies are heterogeneous)
                    t_ph = time.time()
                    _cf.wait([e.future for e in compiling], timeout=0.05,
                             return_when=_cf.FIRST_COMPLETED)
                    self.stats["t_wait"] += time.time() - t_ph
        finally:
            for exp in decoding:
                self.engine.abort(exp.ro)
            while any(not exp.ro.finished for exp in decoding):
                self.engine.step()
            for exp in decoding:
                self.engine.release(exp.ro)
                for n in exp.path:
                    n.visits -= 1
            for exp in compiling:
                for n in exp.path:
                    n.visits -= 1
            for exps_w, _ in scoring:
                for exp in exps_w:     # dispatched but never completed
                    for n in exp.path:
                        n.visits -= 1
