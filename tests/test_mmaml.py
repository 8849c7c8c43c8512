"""MMAML: nets, modulation, inner/outer loops, full trainer smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_models_np import episode, make_cfg
from wmfml_tpu.models.registry import build_model


pytestmark = __import__("pytest").mark.slow  # multi-minute CPU smoke

def mmaml_cfg(**kw):
    d = dict(method="MMAMLShapeNet1D", task="shapenet_1d",
             num_filters=32, num_updates=2, test_num_updates=2,
             update_lr=0.002, first_order=False, beta=0.001, dim_w=196)
    d.update(kw)
    return make_cfg(**d)


def test_embedding_and_gated_shapes():
    cfg = mmaml_cfg()
    bundle = build_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(5, 128, 128, 1), jnp.float32)
    evars = bundle.embed.init({"params": jax.random.PRNGKey(0)}, x)
    embs = bundle.embed.apply(evars, x)
    assert tuple(e.shape[0] for e in embs) == (64, 128, 256, 512)
    gvars = bundle.gated.init({"params": jax.random.PRNGKey(1)}, x,
                              embeddings=embs)
    out = bundle.gated.apply(gvars, x, embeddings=embs)
    assert out.shape == (5, 2)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)
    # modulation actually changes the output
    out_nomod = bundle.gated.apply(gvars, x, embeddings=None)
    assert not np.allclose(np.asarray(out), np.asarray(out_nomod))


def test_mmaml_outer_and_grads():
    from wmfml_tpu.train.mmaml import build_mmaml_outer

    cfg = mmaml_cfg()
    bundle = build_model(cfg)
    b = episode(cfg)
    x0 = jnp.zeros((cfg.max_ctx_num, 128, 128, 1))
    evars = bundle.embed.init({"params": jax.random.PRNGKey(0)}, x0)
    embs = bundle.embed.apply(evars, x0)
    gvars = bundle.gated.init({"params": jax.random.PRNGKey(1)}, x0,
                              embeddings=embs)
    params = {"model": gvars["params"], "embedding": evars["params"]}
    outer = build_mmaml_outer(bundle, cfg, num_steps=2, train=False,
                              test=False)
    key = jax.random.PRNGKey(2)
    loss = float(jax.jit(outer)(params, b, key))
    assert np.isfinite(loss)
    grads = jax.grad(lambda p: outer(p, b, key))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # embedding network receives gradient through the modulation path
    emb_norm = sum(float(jnp.sum(jnp.abs(g))) for g in
                   jax.tree_util.tree_leaves(grads["embedding"]))
    assert emb_norm > 0.0


def test_mmaml_trainer_smoke(tmp_path):
    import os

    from wmfml_tpu.data.shapenet_1d import ShapeNet1D
    from wmfml_tpu.data.synthetic import ensure_dataset
    from wmfml_tpu.train.mmaml import MMAMLTrainer

    root = ensure_dataset(
        "shapenet_1d", os.path.join(os.path.dirname(__file__), "..",
                                    "data_synth"))
    cfg = mmaml_cfg(tasks_per_batch=2, max_ctx_num=5, query_num=4,
                    iterations=2, val_freq=2, val_iters=1, data_size="small")
    cfg.results_root = str(tmp_path)
    cfg.save_path = str(tmp_path / "run")
    cfg.create_dirs()
    data = ShapeNet1D(root, cfg.img_size, seed=0, data_size="small",
                      max_ctx=cfg.max_ctx_num, query_num=cfg.query_num)
    bundle = build_model(cfg)
    trainer = MMAMLTrainer(bundle, cfg, data)
    trainer.train()
    assert trainer.best_loss["validation"] < 10000


def test_conv_embedding_gru_aggregation_masked_parity():
    """The reference-dead rnn_aggregation option
    (networks/conv_embedding_model.py:76-88,132-144): bidirectional 2-layer
    GRU readout. Padded episodes must equal their truncated (ragged)
    equivalents — the carry is held on masked steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wmfml_tpu.models.mmaml_nets import ConvEmbeddingNet

    net = ConvEmbeddingNet(embedding_dims=(8, 16), num_channels=4,
                           hidden_size=16, rnn_aggregation=True,
                           num_layers=2)
    x = jnp.asarray(np.random.RandomState(0).rand(5, 32, 32, 1),
                    jnp.float32)
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    variables = net.init(jax.random.PRNGKey(0), x, mask)
    # GRU params exist for both directions and layers
    names = set(variables["params"].keys())
    assert {"gru_l0_fwd", "gru_l0_bwd", "gru_l1_fwd", "gru_l1_bwd"} <= names
    out_padded = net.apply(variables, x, mask)
    assert tuple(o.shape[-1] for o in out_padded) == (8, 16)
    # ragged equivalence: only valid rows matter. NB batch statistics in
    # the conv stack also see only valid rows (masked batch norm), so the
    # truncated forward is bitwise-equivalent mathematically
    out_trunc = net.apply(variables, x[:3], jnp.ones((3,)))
    for a, b in zip(out_padded, out_trunc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    # and the GRU actually aggregates: different instance order changes
    # the embedding (unlike the permutation-invariant avg-pool default)
    out_perm = net.apply(variables, x[jnp.array([2, 1, 0, 3, 4])], mask)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(out_padded, out_perm))


def test_mmaml_optimizer_flatten_gate():
    """build_mmaml_optimizer flattens on the flag ALONE (MMAML state is
    always replicated — no TP placements to conflict with), is stable
    across mesh shapes, and flatten_opt=false keeps per-leaf state
    (round-3 review fix)."""
    from wmfml_tpu.train.mmaml import build_mmaml_optimizer

    params = {"model": {"w": jnp.ones((3, 4))},
              "embedding": {"e": jnp.ones((2,))}}

    def mu_leaf_shapes(cfg):
        opt_state = build_mmaml_optimizer(cfg).init(params)
        return sorted(
            x.shape for x in jax.tree_util.tree_leaves(opt_state)
            if hasattr(x, "shape") and x.size > 1)

    # flatten_opt defaults to False since round 4 (restore auto-detects
    # either layout); the gate itself is what this test pins
    flat = mu_leaf_shapes(mmaml_cfg(flatten_opt=True))
    flat_tp = mu_leaf_shapes(mmaml_cfg(flatten_opt=True,
                                       mesh_shape={"data": 1, "model": 2}))
    per_leaf = mu_leaf_shapes(mmaml_cfg(flatten_opt=False))
    assert all(len(s) == 1 for s in flat)   # flattened: 1-D vectors only
    assert flat_tp == flat                  # layout independent of mesh
    assert (3, 4) in per_leaf               # flag off: per-leaf shapes
