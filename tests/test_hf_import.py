"""HF weight import parity (GPT.from_pretrained, train_gpt2.py:148-195).

No network: builds a tiny random-init transformers GPT2LMHeadModel
in-process, imports its state dict through tools/import_hf.py's mapping
(Conv1D transposes included), and checks our forward's logits against the
torch model's to fp32 tolerance.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from llmc_paged_tpu import formats
from llmc_paged_tpu.models import gpt2


@pytest.fixture(scope="module")
def tiny_hf_model():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    torch.manual_seed(0)
    hf_cfg = transformers.GPT2Config(
        vocab_size=97, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    model = transformers.GPT2LMHeadModel(hf_cfg).eval()
    return model


def test_state_dict_mapping_and_logit_parity(tiny_hf_model):
    import torch
    from import_hf import config_from_hf, params_from_state_dict

    model = tiny_hf_model
    cfg = config_from_hf(model.config)
    params = params_from_state_dict(model.state_dict(), cfg)
    shapes = formats.param_shapes(cfg)
    assert set(params) == set(shapes)

    x = np.array([[5, 17, 3, 42, 8, 9, 60, 1]], dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).logits.numpy()
    dev = gpt2.to_device(params, cfg)
    got = np.asarray(gpt2.forward(dev, jnp.asarray(x, jnp.int32), cfg))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_checkpoint_roundtrip(tmp_path, tiny_hf_model):
    from import_hf import config_from_hf, params_from_state_dict

    model = tiny_hf_model
    cfg = config_from_hf(model.config)
    params = params_from_state_dict(model.state_dict(), cfg)
    out = tmp_path / "hf_import.bin"
    formats.write_checkpoint(str(out), cfg, params)
    cfg2, params2 = formats.read_checkpoint(str(out))
    assert cfg2 == cfg
    for k in params:
        np.testing.assert_array_equal(params[k], params2[k])
