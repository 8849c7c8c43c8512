"""torch-import unpickle guard: the weights_only=False fallback must refuse
pickles referencing anything outside the tensor-checkpoint allowlist
(ADVICE round 3: a malicious .pt is exactly the input that fails the
weights_only load, so the silent fallback was an ACE surface)."""

import os
import pickle
import zipfile

import pytest
import torch

from wmfml_tpu.ckpt.torch_import import (_PICKLE_GLOBAL_ALLOWLIST,
                                         _scan_pickle_globals,
                                         load_torch_variables)


class _Cfg:
    method = "MMAMLShapeNet1D"
    n_hidden_units_r = []
    img_agg = None
    agg_mode = None


class Evil:
    """Unpickling this would call os.system."""

    def __reduce__(self):
        return (os.system, ("true",))


def _write_zip_pt(path, payload):
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps(payload))


def test_scan_finds_globals(tmp_path):
    p = str(tmp_path / "evil.pt")
    _write_zip_pt(p, Evil())
    found = _scan_pickle_globals(p)
    bad = [g for g in found if g not in _PICKLE_GLOBAL_ALLOWLIST]
    assert any("system" in name for _, name in bad), found


def test_malicious_pt_refused(tmp_path):
    p = str(tmp_path / "evil.pt")
    _write_zip_pt(p, {"model_state_dict": Evil()})
    with pytest.raises(RuntimeError, match="refusing to unpickle"):
        load_torch_variables(_Cfg(), p)


def test_malicious_legacy_pickle_refused(tmp_path):
    p = str(tmp_path / "evil_legacy.pt")
    with open(p, "wb") as f:
        pickle.dump(Evil(), f)
    with pytest.raises(RuntimeError, match="refusing to unpickle"):
        load_torch_variables(_Cfg(), p)


def test_plain_tensor_checkpoint_scan_clean(tmp_path):
    """A normal torch.save state_dict only references allowlisted globals
    (it also loads via weights_only=True, never reaching the scan — this
    pins the allowlist against torch serialization drift)."""
    p = str(tmp_path / "ok.pt")
    torch.save({"state_dict": {"w": torch.zeros(2, 2)}}, p)
    found = _scan_pickle_globals(p)
    assert all(g in _PICKLE_GLOBAL_ALLOWLIST for g in found), [
        g for g in found if g not in _PICKLE_GLOBAL_ALLOWLIST]


def test_mmaml_combined_dict_scan_clean(tmp_path):
    """A reference-style MMAML combined dict (model/embedding/optimizer
    state_dicts — trainer/meta_learner_reg.py:218-227) passes the global
    scan at both pickle protocols, so legitimate fallbacks stay usable."""
    lin = torch.nn.Linear(3, 2)
    opt = torch.optim.Adam(lin.parameters())
    lin(torch.zeros(1, 3)).sum().backward()
    opt.step()
    payload = {
        "model_state_dict": lin.state_dict(),
        "embedding_model_state_dict": torch.nn.Linear(2, 2).state_dict(),
        "optimizers": [opt.state_dict()],
    }
    for proto in (2, 4):
        p = str(tmp_path / f"mmaml_p{proto}.pt")
        torch.save(payload, p, pickle_protocol=proto)
        found = _scan_pickle_globals(p)
        bad = [g for g in found if g not in _PICKLE_GLOBAL_ALLOWLIST]
        assert not bad, f"protocol {proto}: {bad}"
