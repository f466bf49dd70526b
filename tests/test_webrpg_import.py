"""WebRPG element-VAE checkpoint import parity vs a torch mirror of
baselines_model/vae.py:35 VAE."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import import_webrpg_vae
from advancedliteratemachinery_tpu.models.webrpg import ElementVAE, WebRPGConfig

VOCAB, LATENT, T = 24, 6, 5
HIDDEN = (8, 12, 16)


class TVAE(nn.Module):
    def __init__(self):
        super().__init__()
        act = nn.LeakyReLU(0.01)
        self.dimension_reduction = nn.Sequential(nn.Linear(VOCAB, 128), act)
        self.encoder_input = nn.Sequential(nn.Linear(128 * T, HIDDEN[-1]), act)
        mods, in_dim = [], HIDDEN[-1]
        for h in HIDDEN[::-1]:
            mods.append(nn.Sequential(nn.Linear(in_dim, h), nn.LayerNorm(h), act))
            in_dim = h
        self.encoder = nn.Sequential(*mods)
        self.enc_mu = nn.Linear(HIDDEN[0], LATENT)
        self.enc_logvar = nn.Linear(HIDDEN[0], LATENT)
        mods, in_dim = [], LATENT
        for h in HIDDEN:
            mods.append(nn.Sequential(nn.Linear(in_dim, h), nn.LayerNorm(h), act))
            in_dim = h
        self.decoder = nn.Sequential(*mods)
        self.final_layer = nn.Sequential(nn.Linear(HIDDEN[-1], 128 * T), act)
        self.final_layer2 = nn.Linear(128, VOCAB)

    def encode(self, ids):
        emb = self.dimension_reduction(
            torch.nn.functional.one_hot(ids, VOCAB).float())
        x = self.encoder_input(torch.flatten(emb, start_dim=1))
        x = self.encoder(x)
        return self.enc_mu(x), self.enc_logvar(x)

    def decode(self, z):
        x = self.final_layer(self.decoder(z))
        return self.final_layer2(x.view(-1, T, 128))


@pytest.mark.model
class TestWebRPGVAEImport:
    def test_encode_decode_parity(self):
        torch.manual_seed(0)
        tm = TVAE().eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        cfg = WebRPGConfig(param_vocab=VOCAB, latent_dim=LATENT,
                           parameters_len=T, vae_hidden=HIDDEN)
        vae = ElementVAE(cfg, policy=FP32_POLICY)
        rng = np.random.default_rng(0)
        ids = rng.integers(0, VOCAB, (3, T))
        variables = vae.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                             jax.random.PRNGKey(1))
        variables = import_webrpg_vae(sd, jax.tree.map(np.asarray, variables))

        with torch.no_grad():
            want_mu, want_lv = tm.encode(torch.from_numpy(ids))
        got_mu, got_lv = vae.apply(variables, jnp.asarray(ids),
                                   method=ElementVAE.encode)
        np.testing.assert_allclose(np.asarray(got_mu), want_mu.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_lv), want_lv.numpy(),
                                   rtol=1e-4, atol=1e-4)

        z = rng.standard_normal((3, LATENT)).astype(np.float32)
        with torch.no_grad():
            want_dec = tm.decode(torch.from_numpy(z))
        got_dec = vae.apply(variables, jnp.asarray(z),
                            method=ElementVAE.decode)
        np.testing.assert_allclose(np.asarray(got_dec), want_dec.numpy(),
                                   rtol=1e-4, atol=1e-4)
