"""MKP transformer parity: our Flax TransformerModel vs the actual reference
torch module (mkp_transformer/net.py, importable — torch only) with the
committed pretrained mkp300 checkpoint.
"""
import importlib.util
import sys

import numpy as np
import torch

import jax.numpy as jnp

from deepaco_tpu.models.transformer import (
    TransformerModel,
    load_transformer_checkpoint,
)

CKPT = "/root/reference/pretrained/mkp_transformer/mkp300.pt"


def load_reference_net():
    spec = importlib.util.spec_from_file_location(
        "ref_mkp_t_net", "/root/reference/mkp_transformer/net.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_mkp_t_net"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_transformer_matches_reference_checkpoint():
    rng = np.random.default_rng(0)
    n, m = 40, 5
    price = rng.random(n).astype(np.float32)
    weight = rng.random((n, m)).astype(np.float32)
    src = np.concatenate([price[:, None], weight], axis=1)  # [n, 6]

    ref_mod = load_reference_net()
    net = ref_mod.TransformerModel()
    net.load_state_dict(torch.load(CKPT, map_location="cpu", weights_only=True))
    net.eval()
    with torch.no_grad():
        # reference forward takes [seq, batch, feat]
        ref = net(torch.tensor(src).unsqueeze(1)).numpy()

    model = TransformerModel()
    variables = load_transformer_checkpoint(CKPT)
    ours = np.asarray(model.apply(variables, jnp.asarray(src)))
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-5)
