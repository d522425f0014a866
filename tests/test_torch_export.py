"""Inverse weight export: sln_amodal_tpu params → reference torch layout
(convert/torch_export.py). The round-trip reference_sd → convert →
export must be the identity on the reference key set, bit for bit —
which also proves a tree trained HERE lands in exactly the layout the
reference's ``load_weights`` (model.py:287-295) expects.
"""

import numpy as np
import pytest

from sln_amodal_tpu.convert.torch_export import (
    export_deeplab_state_dict,
    export_state_dict,
    save_torch_checkpoint,
)
from sln_amodal_tpu.convert.torch_weights import (
    convert_deeplab,
    convert_full_checkpoint,
    load_torch_state_dict,
)
from tests.test_convert_full import build_reference_state_dict


def randomized_reference_sd(seed=0, num_classes=2):
    rng = np.random.default_rng(seed)
    return {k: rng.normal(size=v.shape).astype(np.float32)
            for k, v in build_reference_state_dict(num_classes).items()}


def test_roundtrip_is_identity_on_reference_keys():
    sd = randomized_reference_sd()
    out = export_state_dict(convert_full_checkpoint(sd))
    assert set(out) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)


def test_roundtrip_without_glm():
    sd = {k: v for k, v in randomized_reference_sd().items()
          if not k.startswith("GLM_modual.")}
    out = export_state_dict(convert_full_checkpoint(sd))
    assert set(out) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)


def test_standalone_deeplab_roundtrip():
    full = randomized_reference_sd(seed=3)
    glm_sd = {k[len("GLM_modual."):]: v for k, v in full.items()
              if k.startswith("GLM_modual.")}
    tree = {"params": {"glm": convert_deeplab(glm_sd, prefix="")}}
    out = export_deeplab_state_dict(tree)
    assert set(out) == set(glm_sd)
    for k in glm_sd:
        np.testing.assert_array_equal(out[k], glm_sd[k], err_msg=k)


@pytest.mark.slow
def test_export_cli_roundtrips_native_ckpt(tmp_path):
    """The module CLI exports a native .ckpt into a reference-layout .pth
    whose tensors equal the original reference values (full circle:
    reference sd → our tree → our .ckpt → CLI → .pth → reference sd)."""
    pytest.importorskip("torch")
    from sln_amodal_tpu.convert.torch_export import main
    from sln_amodal_tpu.train import checkpoint as ckpt

    sd = randomized_reference_sd(seed=11)
    tree = convert_full_checkpoint(sd)
    path = ckpt.save(tree, str(tmp_path), "exp", 1)
    out = str(tmp_path / "back.pth")
    main([path, out])
    back = load_torch_state_dict(out)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_saved_pth_reloads_via_torch(tmp_path):
    pytest.importorskip("torch")
    sd = randomized_reference_sd(seed=7)
    tree = convert_full_checkpoint(sd)
    path = save_torch_checkpoint(tree, str(tmp_path / "export.pth"))
    back = load_torch_state_dict(path)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)
    # and the exported .pth converts straight back into the same tree
    tree2 = convert_full_checkpoint(back)
    import jax
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_flatten_with_path(tree)[0],
            jax.tree_util.tree_flatten_with_path(tree2)[0]):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
