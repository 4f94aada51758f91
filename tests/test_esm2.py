"""JAX-native ESM-2 vs the HuggingFace torch port.

The reference conditions on fair-esm ESM-2 650M outputs
(`/root/reference/generate.py:40-62`); HF `transformers.EsmModel` is the
numerically-equivalent port of that architecture. These tests pin the
in-repo JAX implementation against HF on tiny RANDOM models (no weights
needed offline) — covering rotary attention, ESM token dropout, padding
semantics, and the converter — which transfers to the real 650M checkpoint
because the computation graph is identical at every size."""

import numpy as np
import pytest

from protein_redesign_tpu.models.esm2 import (
    ESM2Config,
    JaxESM2,
    esm2_config_from_hf,
    esm2_forward,
    esm2_params_from_hf,
    esm2_random_params,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def tiny_hf_model(seed=0, **overrides):
    from transformers import EsmConfig, EsmModel

    kwargs = dict(
        vocab_size=33,
        hidden_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=96,
        max_position_embeddings=512,
        position_embedding_type="rotary",
        token_dropout=True,
        emb_layer_norm_before=False,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pad_token_id=1,
        mask_token_id=32,
        attn_implementation="eager",
    )
    kwargs.update(overrides)
    cfg = EsmConfig(**kwargs)
    torch.manual_seed(seed)
    return EsmModel(cfg, add_pooling_layer=False).eval(), cfg


def hf_reference_forward(model, ids, mask):
    """fair-esm-faithful HF forward.

    transformers 4.57's `EsmModel.forward` calls `self.embeddings` WITHOUT
    the attention mask (modeling_esm.py:716-719), so its token-dropout
    rescale uses the padded length and the pad-row zeroing is skipped —
    diverging from fair-esm (`esm/model/esm2.py`), whose `src_lengths =
    (~padding_mask).sum(-1)`. The reference loads fair-esm via torch.hub
    (`/root/reference/generate.py:41`), so we pin against the mask-aware
    chain: embeddings(attention_mask=...) -> encoder."""
    tids, tmask = torch.tensor(ids), torch.tensor(mask)
    with torch.inference_mode():
        emb = model.embeddings(input_ids=tids, attention_mask=tmask)
        ext = model.get_extended_attention_mask(tmask, tids.shape)
        return model.encoder(emb, attention_mask=ext).last_hidden_state.numpy()


def hf_and_jax_outputs(ids, mask, seed=0, **overrides):
    model, hf_cfg = tiny_hf_model(seed=seed, **overrides)
    ref = hf_reference_forward(model, ids, mask)
    params = esm2_params_from_hf(model.state_dict())
    cfg = esm2_config_from_hf(hf_cfg)
    out = np.asarray(
        esm2_forward(
            params, cfg, np.asarray(ids, np.int32), np.asarray(mask, np.int32)
        )
    )
    return ref, out


class TestHFParity:
    def test_full_forward_matches_hf(self):
        rng = np.random.RandomState(0)
        B, L = 3, 17
        ids = rng.randint(4, 29, size=(B, L))
        ids[:, 0] = 0   # <cls>
        ids[0, 5] = 32  # a <mask> token (exercises token dropout)
        ids[1, 9] = 32
        mask = np.ones((B, L), np.int64)
        mask[1, 12:] = 0
        ids[1, 12:] = 1  # pad
        ref, out = hf_and_jax_outputs(ids, mask)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def test_no_token_dropout_variant(self):
        rng = np.random.RandomState(1)
        ids = rng.randint(4, 29, size=(2, 11))
        mask = np.ones((2, 11), np.int64)
        ref, out = hf_and_jax_outputs(ids, mask, seed=3, token_dropout=False)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def test_unpadded_full_hf_forward_matches(self):
        """Without padding, even transformers' own top-level forward agrees
        (the mask divergence documented in hf_reference_forward is
        padding-only) — this is the path the torch ESMEmbedder backend
        uses, one sequence at a time."""
        rng = np.random.RandomState(4)
        ids = rng.randint(4, 29, size=(2, 15))
        ids[0, 3] = 32
        mask = np.ones((2, 15), np.int64)
        model, hf_cfg = tiny_hf_model(seed=7)
        with torch.inference_mode():
            ref = model(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
            ).last_hidden_state.numpy()
        out = np.asarray(
            esm2_forward(
                esm2_params_from_hf(model.state_dict()),
                esm2_config_from_hf(hf_cfg),
                np.asarray(ids, np.int32),
                np.asarray(mask, np.int32),
            )
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def test_all_mask_heavy_sequence(self):
        # High observed mask ratio stresses the token-dropout rescale.
        ids = np.full((1, 9), 32, np.int64)
        ids[0, 0] = 0
        ids[0, -1] = 2
        mask = np.ones((1, 9), np.int64)
        ref, out = hf_and_jax_outputs(ids, mask, seed=5)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


class TestEmbedderJaxBackend:
    def test_embed_chain_masked_matches_hf(self, tmp_path):
        """ESMEmbedder(backend='jax') end-to-end: local HF weights ->
        converter -> bucketed jit forward, '<mask>' kept as one token."""
        from protein_redesign_tpu.utils.esm import (
            ESM_TOKEN_INDEX,
            ESMEmbedder,
        )

        model, hf_cfg = tiny_hf_model(seed=9)
        model_dir = tmp_path / "esm_tiny"
        model.save_pretrained(model_dir)

        emb = ESMEmbedder(
            model_name=str(model_dir),
            esm_dim=hf_cfg.hidden_size,
            backend="jax",
        )
        assert emb.available
        seq = "MKT<mask>LVA"
        reps = emb.embed_chain_masked(seq)
        assert reps.shape == (7, hf_cfg.hidden_size)

        toks = ["M", "K", "T", "<mask>", "L", "V", "A"]
        ids = np.asarray(
            [[ESM_TOKEN_INDEX["<cls>"]]
             + [ESM_TOKEN_INDEX[t] for t in toks]
             + [ESM_TOKEN_INDEX["<eos>"]]],
            np.int64,
        )
        ref = hf_reference_forward(model, ids, np.ones_like(ids))
        np.testing.assert_allclose(
            reps, ref[0, 1:-1], atol=2e-5, rtol=2e-5
        )


class TestArchitectureGuard:
    def test_non_rotary_config_rejected(self):
        """ESM-1b-style configs (absolute positions or pre-embedding LN)
        must fail loudly, not compute silently wrong embeddings."""
        from transformers import EsmConfig

        cfg_abs = EsmConfig(
            vocab_size=33, hidden_size=48, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=96,
            position_embedding_type="absolute",
        )
        with pytest.raises(ValueError, match="rotary"):
            esm2_config_from_hf(cfg_abs)

        cfg_preln = EsmConfig(
            vocab_size=33, hidden_size=48, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=96,
            position_embedding_type="rotary", emb_layer_norm_before=True,
        )
        with pytest.raises(ValueError, match="ESM-2"):
            esm2_config_from_hf(cfg_preln)


class TestSemantics:
    def setup_method(self):
        import jax

        self.cfg = ESM2Config(
            hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64
        )
        self.params = esm2_random_params(jax.random.PRNGKey(0), self.cfg)

    def test_padding_invariance(self):
        """Extra padding must not change real-token representations —
        required for the bucketed JaxESM2 wrapper to be exact."""
        rng = np.random.RandomState(2)
        L = 13
        ids = rng.randint(4, 29, size=(1, L)).astype(np.int32)
        mask = np.ones((1, L), np.int32)
        out = np.asarray(esm2_forward(self.params, self.cfg, ids, mask))

        pad = 8
        ids_p = np.concatenate(
            [ids, np.full((1, pad), 1, np.int32)], axis=1
        )
        mask_p = np.concatenate([mask, np.zeros((1, pad), np.int32)], axis=1)
        out_p = np.asarray(esm2_forward(self.params, self.cfg, ids_p, mask_p))
        np.testing.assert_allclose(out_p[:, :L], out, atol=1e-5, rtol=1e-5)

    def test_bucketed_wrapper_matches_direct(self):
        rng = np.random.RandomState(3)
        L = 21
        ids = rng.randint(4, 29, size=(L,)).astype(np.int32)
        wrapper = JaxESM2(self.params, self.cfg, bucket=16)
        out_w = wrapper(ids)
        out_d = np.asarray(
            esm2_forward(
                self.params, self.cfg, ids[None], np.ones((1, L), np.int32)
            )
        )[0]
        assert out_w.shape == (L, self.cfg.hidden_size)
        np.testing.assert_allclose(out_w, out_d, atol=1e-5, rtol=1e-5)

    def test_mask_token_zeroed_and_rescaled(self):
        """Token dropout: with one <mask> in L real tokens, unmasked rows
        scale by (1-0.12)/(1-1/L) relative to the dropout-off embedding."""
        import jax.numpy as jnp

        L = 10
        ids = np.full((1, L), 7, np.int32)
        ids[0, 4] = self.cfg.mask_token_id
        mask = np.ones((1, L), np.int32)
        emb = self.params["embed"]["weight"]
        x_masked = np.array(emb[ids])
        x_masked[0, 4] = 0.0
        expected_scale = (1 - 0.15 * 0.8) / (1 - 1 / L)
        # Check via a 0-layer config (pure embedding + final LN is too
        # entangled; instead verify the embedding math directly).
        from protein_redesign_tpu.models.esm2 import MASK_RATIO_TRAIN

        is_mask = (ids == self.cfg.mask_token_id).astype(np.float32)
        x = np.asarray(emb[ids]) * (1 - is_mask)[..., None]
        observed = is_mask.sum(-1) / L
        x = x * ((1 - MASK_RATIO_TRAIN) / (1 - observed))[:, None, None]
        np.testing.assert_allclose(
            x, x_masked * expected_scale, atol=1e-6, rtol=1e-6
        )
        assert np.all(x[0, 4] == 0.0)
