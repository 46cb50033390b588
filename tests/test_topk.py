"""Device top-k scoring path must agree with the full-cost path."""

import numpy as np

from hic_genome_assembler_tpu.ops import cost, perms


def _problem(seed=0, sizes=(5, 4, 3, 2)):
    rng = np.random.default_rng(seed)
    C = sum(sizes)
    m = rng.random((C, C))
    m = np.triu(m, 1)
    m = m + m.T + np.diag(rng.random(C))
    return m, list(sizes)


def test_topk_contains_true_best():
    m, sizes = _problem()
    scorer = cost.BlockScorer(m, sizes, dtype=np.float64)
    orders = perms.order_batch(len(sizes))
    orients = perms.orient_batch(len(sizes))
    full = scorer.score_batch(orders, orients)
    idx, vals, _floor = scorer.score_batch_topk(orders, orients, k=16)
    assert int(np.argmax(full)) in set(idx.tolist())
    # values agree with the full path at the returned indices
    np.testing.assert_allclose(vals, full[idx], rtol=1e-9)


def test_topk_chunked_merge():
    m, sizes = _problem(3)
    scorer = cost.BlockScorer(m, sizes, dtype=np.float64)
    orders = perms.order_batch(len(sizes))
    orients = perms.orient_batch(len(sizes))
    full = scorer.score_batch(orders, orients)
    # force multiple chunks including a ragged tail
    idx, vals, _floor = scorer.score_batch_topk(orders, orients, k=8, chunk_orders=5)
    assert int(np.argmax(full)) in set(idx.tolist())
    np.testing.assert_allclose(vals, full[idx], rtol=1e-9)
    # winner through the sparse tie rule == winner through the dense rule
    R = len(orients)
    w_sparse, _ = cost.argmax_reference_ties_sparse(
        idx, rescore=lambda i: scorer.score_host(orders[i // R], orients[i % R])
    )
    w_dense, _ = cost.argmax_reference_ties(
        full, rescore=lambda i: scorer.score_host(orders[i // R], orients[i % R])
    )
    assert w_sparse == w_dense


def test_topk_mesh_sharded():
    from hic_genome_assembler_tpu.parallel import mesh as pm

    mesh = pm.make_mesh((8, 1))
    m, sizes = _problem(4)
    orders = perms.order_batch(len(sizes))
    orients = perms.orient_batch(len(sizes))
    local = cost.BlockScorer(m, sizes, dtype=np.float64)
    sharded = cost.BlockScorer(m, sizes, dtype=np.float64, mesh=mesh)
    full = local.score_batch(orders, orients)
    idx, vals, _floor = sharded.score_batch_topk(orders, orients, k=16)
    assert int(np.argmax(full)) in set(idx.tolist())
    np.testing.assert_allclose(vals, full[idx], rtol=1e-12)
