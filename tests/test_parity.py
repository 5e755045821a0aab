"""Golden-parity tests: torch twin vs. flax model (SURVEY.md §4 item 1, §7 M0).

The reference tree is a torch repo; its weights load into `weights.torch_twin`.
These tests prove the port machinery: a torch-initialized network, ported to
flax, must produce the same head maps within float tolerance. This is the
self-parity fallback mandated by SURVEY.md §7 M0 while /root/reference is an
empty mount — the *machinery* is the deliverable, and it will work unchanged
on real reference checkpoints.
"""

import jax
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


def _foreign_renamed_state(cfg):
    """A synthetic 'reference-style' checkpoint: torchvision-ish names
    (features.N.M.weight), extra num_batches_tracked buffers, and a
    'module.'-free layout — same tensors as the twin, different names."""
    import torch

    from tpucenterface.weights.torch_twin import TorchCenterFace

    torch.manual_seed(11)
    twin = TorchCenterFace(cfg).eval()
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    sd = twin.state_dict()
    foreign = {}
    for i, (k, v) in enumerate(sd.items()):
        leaf = k.rsplit(".", 1)[-1]
        foreign[f"features.{i // 4}.{i % 4}.{leaf}"] = v.clone()
        if leaf == "running_var":
            foreign[f"features.{i // 4}.{i % 4}.num_batches_tracked"] = (
                torch.tensor(42, dtype=torch.long)
            )
    return twin, foreign


def test_foreign_checkpoint_auto_map_ports_to_parity():
    """VERDICT r1 #4: an arbitrary .pth with renamed modules ports through
    the shape/order auto-mapper to exact parity with the direct twin port."""
    from tpucenterface.weights.port import (
        flax_from_foreign_state,
        flax_from_torch_module,
        propose_name_map,
    )

    cfg = ModelConfig(compute_dtype="float32")
    twin, foreign = _foreign_renamed_state(cfg)
    prop = propose_name_map(foreign, cfg)
    assert not prop["unmatched_twin"], prop["unmatched_twin"][:5]
    assert not prop["unmatched_foreign"]
    # MobileNet repeats identical block shapes, so shape/order alignment is
    # inherently order-ambiguous there — the mapper must SAY so rather than
    # claim completeness (VERDICT r2 #4)
    assert prop["ambiguous"]
    assert not prop["complete"]

    v_direct = flax_from_torch_module(twin, cfg)
    v_foreign = flax_from_foreign_state(foreign, cfg, allow_ambiguous=True)
    flat_a = jax.tree.leaves(v_direct)
    flat_b = jax.tree.leaves(v_foreign)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_foreign_checkpoint_declarative_name_map():
    """Explicit (regex, replacement) rules: drop bookkeeping buffers and
    rewrite a prefix; incomplete maps must fail loudly."""
    import pytest

    from tpucenterface.weights.port import apply_name_map, flax_from_foreign_state

    cfg = ModelConfig(compute_dtype="float32")
    twin, _ = _foreign_renamed_state(cfg)
    sd = {f"base_net.{k}": v for k, v in twin.state_dict().items()}
    sd["base_net.extra.num_batches_tracked"] = np.int64(7)

    name_map = [
        (r"num_batches_tracked", None),      # drop
        (r"^base_net\.", ""),                # strip prefix
    ]
    v = flax_from_foreign_state(sd, cfg, name_map=name_map)
    ref = flax_from_foreign_state(
        apply_name_map(sd, name_map), cfg, name_map=[]
    )
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a truncated foreign checkpoint must be rejected with a report
    bad = dict(list(sd.items())[:-6])
    with pytest.raises((ValueError, KeyError)):
        flax_from_foreign_state(bad, cfg, name_map=name_map)


def test_auto_map_flags_swapped_same_shape_layers():
    """VERDICT r2 #4 'done' criterion: a checkpoint with two same-shape
    units in swapped order must be flagged/refused — never `complete: True`
    with crossed weights."""
    import pytest

    from tpucenterface.weights.port import (
        flax_from_foreign_state,
        propose_name_map,
    )

    cfg = ModelConfig(compute_dtype="float32")
    _, foreign = _foreign_renamed_state(cfg)

    # find two adjacent foreign units with identical shape signatures and
    # swap their order in the dict (registration-order mismatch)
    keys = list(foreign.keys())
    units = {}
    for k in keys:
        units.setdefault(k.rsplit(".", 1)[0].rsplit(".", 1)[0], []).append(k)
    unit_names = list(units)
    swapped = None
    for a, b in zip(unit_names, unit_names[1:]):
        sig = lambda u: [
            tuple(np.asarray(foreign[k]).shape)
            for k in units[u]
            if np.asarray(foreign[k]).ndim > 0
        ]
        if sig(a) == sig(b):
            swapped = (a, b)
            break
    assert swapped is not None, "test premise: model has repeated shapes"
    a, b = swapped
    order = []
    for k in keys:
        u = k.rsplit(".", 1)[0].rsplit(".", 1)[0]
        if u == a:
            order.append(units[b][len([x for x in order if x in units[b]])])
        elif u == b:
            order.append(units[a][len([x for x in order if x in units[a]])])
        else:
            order.append(k)
    crossed = {k: foreign[k] for k in order}

    prop = propose_name_map(crossed, cfg)
    assert not prop["complete"]
    assert prop["ambiguous"]
    with pytest.raises(ValueError, match="AMBIGUOUS"):
        flax_from_foreign_state(crossed, cfg)
