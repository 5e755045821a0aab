"""Golden-parity tests: torch twin vs. flax model (SURVEY.md §4 item 1, §7 M0).

The reference tree is a torch repo; its weights load into `weights.torch_twin`.
These tests prove the port machinery: a torch-initialized network, ported to
flax, must produce the same head maps within float tolerance. This is the
self-parity fallback mandated by SURVEY.md §7 M0 while /root/reference is an
empty mount — the *machinery* is the deliverable, and it will work unchanged
on real reference checkpoints.
"""

import numpy as np
import pytest
import torch

from tpucenterface.config import ModelConfig
from tpucenterface.model.centernet import CenterFaceNet
from tpucenterface.weights.port import flax_from_torch_module
from tpucenterface.weights.torch_twin import TorchCenterFace

CFG = ModelConfig(compute_dtype="float32")


@pytest.fixture(scope="module")
def twin_and_flax():
    torch.manual_seed(0)
    twin = TorchCenterFace(CFG).eval()
    # randomize BN stats so the port of running_mean/var is actually exercised
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    variables = flax_from_torch_module(twin, CFG)
    return twin, CenterFaceNet(CFG), variables


def test_head_map_parity(twin_and_flax):
    twin, model, variables = twin_and_flax
    rng = np.random.RandomState(1)
    x = rng.rand(2, 160, 160, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        t_out = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    import jax

    j_out = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, x)
    for k in ("hm", "wh", "off"):
        t = t_out[k].numpy().transpose(0, 2, 3, 1)
        j = np.asarray(j_out[k])
        # atol-only: accumulated reassociation error through ~20 conv+BN layers
        # differs between XLA-CPU and torch; 2e-3 absolute on head maps keeps
        # decoded boxes identical (offsets are in stride-4 feature units).
        np.testing.assert_allclose(j, t, atol=2e-3, err_msg=k)


def test_reverse_port_roundtrip(twin_and_flax):
    """flax -> torch -> flax must be the identity (C14 both directions)."""
    from flax.traverse_util import flatten_dict

    from tpucenterface.weights.port import (
        flax_from_torch_state,
        torch_state_from_flax,
    )

    _, _, variables = twin_and_flax
    sd = torch_state_from_flax(variables)
    back = flax_from_torch_state(sd, CFG)
    fa = flatten_dict(variables, sep="/")
    fb = flatten_dict(back, sep="/")
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]), err_msg=k)

    # and it loads into a real torch module
    twin2 = TorchCenterFace(CFG)
    twin2.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()})


def test_port_rejects_missing_keys():
    twin = TorchCenterFace(CFG)
    sd = twin.state_dict()
    sd.pop("backbone.stem.conv.weight")
    from tpucenterface.weights.port import flax_from_torch_state

    with pytest.raises(KeyError):
        flax_from_torch_state(sd, CFG)


def test_safetensors_roundtrip(tmp_path, twin_and_flax):
    _, model, variables = twin_and_flax
    from tpucenterface.weights.io import load_safetensors, save_safetensors

    p = str(tmp_path / "w.safetensors")
    save_safetensors(variables, p)
    loaded = load_safetensors(p)
    from flax.traverse_util import flatten_dict

    fa = flatten_dict(variables, sep="/")
    fb = flatten_dict(loaded, sep="/")
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]), err_msg=k)
