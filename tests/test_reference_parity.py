"""Differential parity vs the ACTUAL reference torch code.

Every test here runs the reference's own modules (imported from
``/root/reference`` by ``tests/_reference_loader.py``) and our TPU-native
implementation on identical inputs, asserting numerical equality. Unlike
``tests/test_ops.py`` (golden NumPy ports), a misreading of the reference
cannot pass these tests.

Covered components (reference ``file:line``):

- ``Propagation.aggregate_k_hop_features``        node/ragraph_utils/Propagation.py:7-26
- ``SimilarityFunctions.calculate_cosine_similarity``  SimilarityFunctions.py:6-18
- ``PositionAwareEncoder.floyd_warshall`` + ``encode_position_aware_code``  PositionAwareEncoder.py:6-47
- ``InverseSampling`` dense + sparse               InverseSampling.py:6-56 / edge :6-69
- ``preprompt.compareloss`` / ``get_subgraph_3`` / ``prompt_pretrain_sample``  preprompt.py:8-126
- ``layers.GCN`` / ``models.GcnLayers`` / ``models.GraphCL`` forward   layers/gcn.py:26-41, models/gcnlayers.py:40-66, models/graphcl.py:18-60
- ``utility.normalize_adj``                        ragraph_utils/utility.py:19-26
- edge ``modules/utils`` scatter ops + ``cal_infonce``   modules/utils.py:6-37,80-88
- edge ``BaseModel._bpr_loss`` / ``_nce_loss``     modules/base_model.py:81-93
- edge ``RAGraph._edge_binorm`` / ``_relative_edge_time_encoding`` / ``_agg``  modules/RAGraph.py:232-263
- edge ``Metric`` full eval protocol               utils/metrics.py:12-141
- the staged interpolative merge                   finetune_rag.py:70-86
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from _reference_loader import interpolative_merge_reference, load_reference

ATOL = 2e-5


@pytest.fixture(scope="module")
def R():
    return load_reference()


def _rand_graph(rng, n, p=0.3, self_loops=True):
    """Symmetric binary adjacency with no isolated nodes."""
    adj = (rng.random((n, n)) < p).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    if self_loops:
        np.fill_diagonal(adj, 1.0)
    else:
        np.fill_diagonal(adj, 0.0)
        # ensure no zero rows (reference divides by degree)
        for i in range(n):
            if adj[i].sum() == 0:
                j = (i + 1) % n
                adj[i, j] = adj[j, i] = 1.0
    return adj


# ---------------------------------------------------------------------------
# RAG core math
# ---------------------------------------------------------------------------

def test_khop_propagation_parity(R):
    from ragraph_tpu.ops.propagation import aggregate_k_hop_dense
    rng = np.random.default_rng(0)
    adj = _rand_graph(rng, 17)
    x = rng.standard_normal((17, 9)).astype(np.float32)
    for k in (1, 3):
        ref = R.node_Propagation.aggregate_k_hop_features(
            torch.tensor(adj), torch.tensor(x), k).numpy()
        ours = np.asarray(aggregate_k_hop_dense(jnp.asarray(adj),
                                                jnp.asarray(x), k))
        np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_cosine_similarity_parity(R):
    from ragraph_tpu.ops.similarity import cosine_similarity
    rng = np.random.default_rng(1)
    q = rng.standard_normal((11, 16)).astype(np.float32)
    keys = rng.standard_normal((23, 16)).astype(np.float32)
    ref = R.node_SimilarityFunctions.calculate_cosine_similarity(
        torch.tensor(q), torch.tensor(keys)).numpy()
    ours = np.asarray(cosine_similarity(jnp.asarray(q), jnp.asarray(keys)))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_floyd_warshall_parity(R):
    from ragraph_tpu.ops.shortest_path import all_pairs_shortest_paths
    rng = np.random.default_rng(2)
    adj = _rand_graph(rng, 19, p=0.15, self_loops=False)
    ref = R.node_PositionAwareEncoder.floyd_warshall(torch.tensor(adj)).numpy()
    ours = np.asarray(all_pairs_shortest_paths(jnp.asarray(adj)))
    finite = np.isfinite(ref)
    np.testing.assert_allclose(ours[finite], ref[finite], atol=ATOL)
    assert (ours[~finite] >= 1e8).all()  # our INF for their inf


def test_position_code_parity(R):
    """Anchor Bellman–Ford == reference Floyd–Warshall + anchor transform.

    The reference draws anchors with ``torch.randint`` internally
    (PositionAwareEncoder.py:11); we reproduce the draw under the same seed
    and feed the identical anchors to our encoder.
    """
    from ragraph_tpu.ops.shortest_path import anchor_distances
    rng = np.random.default_rng(3)
    adj = _rand_graph(rng, 21, p=0.12, self_loops=False)
    num_anchors, dis_q = 6, 5
    torch.manual_seed(42)
    ref = R.node_PositionAwareEncoder.encode_position_aware_code(
        torch.tensor(adj), num_anchors, dis_q=dis_q).numpy()
    torch.manual_seed(42)
    anchors = torch.randint(low=0, high=21, size=(num_anchors,)).numpy()
    dist = np.asarray(anchor_distances(jnp.asarray(adj),
                                       jnp.asarray(anchors), num_hops=dis_q))
    ours = np.where(dist < dis_q, 1.0 / (dist + 1.0), 0.0)
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_pagerank_dense_parity(R):
    from ragraph_tpu.ops.pagerank import pagerank_dense
    rng = np.random.default_rng(4)
    adj = _rand_graph(rng, 25, p=0.2, self_loops=False)
    adj[3, :] = 0.0  # a dangling node (reference handles via uniform row)
    adj[:, 3] = 0.0
    ref = R.node_InverseSampling.pagerank_algorithm(torch.tensor(adj)).numpy()
    ours = np.asarray(pagerank_dense(jnp.asarray(adj)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)  # ref returns pre-step p


def test_inverse_sampling_dense_parity(R):
    from ragraph_tpu.ops.pagerank import inverse_sample_prob_dense
    rng = np.random.default_rng(5)
    adj = _rand_graph(rng, 25, p=0.2, self_loops=False)
    ref = R.node_InverseSampling.compute_sample_prob(torch.tensor(adj)).numpy()
    ours = np.asarray(inverse_sample_prob_dense(jnp.asarray(adj)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_inverse_sampling_sparse_parity(R):
    """Edge COO variant (RAGraph_edge/modules/ragraph_utils/InverseSampling.py:6-69)."""
    from ragraph_tpu.ops.pagerank import inverse_sample_prob_edges
    rng = np.random.default_rng(6)
    n = 30
    adj = _rand_graph(rng, n, p=0.1, self_loops=False)
    adj[5, :] = 0.0
    adj[:, 5] = 0.0  # dangling
    s, r = np.nonzero(adj)
    w = adj[s, r]
    t_adj = torch.sparse_coo_tensor(
        torch.tensor(np.stack([s, r])), torch.tensor(w), (n, n)).coalesce()
    ref = R.edge_InverseSampling.compute_sample_prob(t_adj).numpy()
    ours = np.asarray(inverse_sample_prob_edges(
        jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), n))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_normalize_adj_parity(R):
    from ragraph_tpu.core.graph import normalize_adj_dense
    rng = np.random.default_rng(7)
    adj = _rand_graph(rng, 15, p=0.3, self_loops=False)
    ref = np.asarray(R.node_utility.normalize_adj(adj).todense(),
                     dtype=np.float32)
    # reference callers add I before normalizing (pretrain.py) — test raw
    ours = np.asarray(normalize_adj_dense(jnp.asarray(adj), add_self_loops=False))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


# ---------------------------------------------------------------------------
# preprompt: the live pretraining loss + helpers
# ---------------------------------------------------------------------------

def test_compareloss_parity(R):
    from ragraph_tpu.nn.heads import compare_loss
    rng = np.random.default_rng(8)
    feats = rng.standard_normal((20, 12)).astype(np.float32)
    tuples = rng.integers(0, 20, size=(20, 6))
    ref = R.node_preprompt.compareloss(
        torch.tensor(feats), torch.tensor(tuples), temperature=1.5).item()
    ours = float(compare_loss(jnp.asarray(feats), jnp.asarray(tuples),
                              temperature=1.5))
    assert abs(ours - ref) < ATOL


def test_get_subgraph_3_parity(R):
    from ragraph_tpu.models.preprompt import subgraph3_mean
    rng = np.random.default_rng(9)
    adj = _rand_graph(rng, 13, p=0.2)  # self loops: no zero-count rows
    h = rng.standard_normal((13, 7)).astype(np.float32)
    ref = R.node_preprompt.get_subgraph_3(torch.tensor(h),
                                          torch.tensor(adj)).numpy()
    ours = np.asarray(subgraph3_mean(jnp.asarray(h), jnp.asarray(adj)))
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-5)


def test_prompt_pretrain_sample_structural_parity(R):
    """RNG streams differ (numpy shuffle vs Gumbel top-k), so assert the
    defining invariants of ``preprompt.prompt_pretrain_sample`` hold for
    BOTH implementations on the same graph: col 0 is a neighbor (self if
    none), cols 1..n are distinct non-neighbors."""
    import scipy.sparse as sp
    from ragraph_tpu.models.preprompt import prompt_pretrain_sample
    rng = np.random.default_rng(10)
    adj = _rand_graph(rng, 18, p=0.15, self_loops=False)
    adj[4, :] = 0.0
    adj[:, 4] = 0.0  # isolated node -> must sample itself as positive
    n = 5

    np.random.seed(0)
    ref = R.node_preprompt.prompt_pretrain_sample(sp.csr_matrix(adj), n)
    ours = np.asarray(prompt_pretrain_sample(adj, n,
                                             np.random.default_rng(0)))

    for out in (ref, ours):
        assert out.shape == (18, 1 + n)
        for i in range(18):
            if adj[i].sum() == 0:
                assert out[i, 0] == i
            else:
                assert adj[i, out[i, 0]] > 0
            negs = out[i, 1:]
            assert (adj[i, negs] == 0).all()
            assert len(set(negs.tolist())) == n  # distinct


# ---------------------------------------------------------------------------
# GNN layers / encoder stack / heads (weight-copied forward parity)
# ---------------------------------------------------------------------------

def _copy_gcn_params(ref_gcn):
    """torch ``layers.GCN`` -> our ``DenseGCN`` params dict."""
    return {
        "Dense_0": {"kernel": jnp.asarray(
            ref_gcn.fc.weight.detach().numpy().T)},
        "bias": jnp.asarray(ref_gcn.bias.detach().numpy()),
        "PReLU_0": {"slope": jnp.asarray(
            ref_gcn.act.weight.detach().numpy().reshape(()))},
    }


def test_gcn_layer_parity(R):
    from ragraph_tpu.nn.layers import DenseGCN
    rng = np.random.default_rng(11)
    adj = _rand_graph(rng, 14)
    x = rng.standard_normal((14, 10)).astype(np.float32)
    torch.manual_seed(0)
    ref_gcn = R.node_GCN(10, 8)
    ref = ref_gcn((torch.tensor(x), torch.tensor(adj))).detach().numpy()
    ours = np.asarray(DenseGCN(8).apply(
        {"params": _copy_gcn_params(ref_gcn)}, jnp.asarray(x),
        jnp.asarray(adj)))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_gcn_stack_parity(R):
    """GcnLayers inference path (LP=False: conv-only chain,
    models/gcnlayers.py:40-66) — the path that produces retrieval keys."""
    from ragraph_tpu.nn.stack import GCNStack
    rng = np.random.default_rng(12)
    adj = _rand_graph(rng, 16)
    x = rng.standard_normal((16, 6)).astype(np.float32)
    torch.manual_seed(1)
    ref_stack = R.node_GcnLayers(6, 8, 2, 0.3)
    ref = ref_stack(torch.tensor(x), torch.tensor(adj), False,
                    LP=False).squeeze(0).detach().numpy()
    params = {f"conv_{i}": _copy_gcn_params(ref_stack.convs[i])
              for i in range(2)}
    stack = GCNStack(hidden=8, num_layers=2)
    variables = stack.init(jax.random.key(0), jnp.zeros((16, 6)),
                           jnp.eye(16))
    variables = {**variables, "params": {**variables["params"], **params}}
    ours = np.asarray(stack.apply(variables, jnp.asarray(x),
                                  jnp.asarray(adj), lp=False))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_graphcl_head_parity(R):
    """GraphCL discriminator wiring (models/graphcl.py:18-60) with copied
    bilinear weights, given identical per-view GCN outputs."""
    from ragraph_tpu.nn.heads import GraphCLHead
    rng = np.random.default_rng(13)
    h_0, h_2, h_1, h_3 = (rng.standard_normal((12, 8)).astype(np.float32)
                          for _ in range(4))
    torch.manual_seed(2)
    ref_head = R.node_GraphCL(6, 8, "prelu")

    # reference forward computes the h's from gcn; replicate its tail
    # (prompt scaling, sigmoid readout, two discriminator calls) directly
    prompt = ref_head.prompt.detach()
    read = R.node_AvgReadout()
    th = lambda a: torch.tensor(a).unsqueeze(0)  # (1, N, H): ref is batched
    c_1 = torch.sigmoid(read(th(h_1) * prompt, None))
    c_3 = torch.sigmoid(read(th(h_3) * prompt, None))
    ret1 = ref_head.disc(c_1, th(h_0) * prompt, th(h_2) * prompt)
    ret2 = ref_head.disc(c_3, th(h_0) * prompt, th(h_2) * prompt)
    ref = (ret1 + ret2).detach().numpy().ravel()

    w = ref_head.disc.f_k.weight.detach().numpy()[0]  # (H, H), x1^T A x2
    b = float(ref_head.disc.f_k.bias.detach().numpy()[0])
    params = {"prompt": jnp.asarray(prompt.numpy()),
              "BilinearDiscriminator_0": {
                  "bilinear_w": jnp.asarray(w.T),
                  "bilinear_b": jnp.asarray(b)}}
    ours = np.asarray(GraphCLHead(hidden=8).apply(
        {"params": params}, jnp.asarray(h_0), jnp.asarray(h_2),
        jnp.asarray(h_1), jnp.asarray(h_3)))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


# ---------------------------------------------------------------------------
# Edge package: scatter ops, losses, graph ops, metrics, staged merge
# ---------------------------------------------------------------------------

def test_scatter_ops_parity(R):
    from ragraph_tpu.ops.segment import scatter_sum
    rng = np.random.default_rng(14)
    src = rng.standard_normal((40, 5)).astype(np.float32)
    idx = rng.integers(0, 9, size=40)
    ref = R.edge_utils.scatter_sum(torch.tensor(src), torch.tensor(idx),
                                   dim=0, dim_size=9).numpy()
    ours = np.asarray(scatter_sum(jnp.asarray(src), jnp.asarray(idx), 9))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_cal_infonce_parity(R):
    from ragraph_tpu.models.edge.base import cal_infonce
    rng = np.random.default_rng(15)
    v1 = rng.standard_normal((10, 8)).astype(np.float32)
    v2 = rng.standard_normal((10, 8)).astype(np.float32)
    ref = R.edge_utils.cal_infonce(torch.tensor(v1), torch.tensor(v2),
                                   temperature=0.2).item()
    ours = float(cal_infonce(jnp.asarray(v1), jnp.asarray(v2), 0.2))
    assert abs(ours - ref) < ATOL


def test_bpr_and_nce_loss_parity(R):
    from ragraph_tpu.models.edge.base import bpr_loss, nce_loss
    rng = np.random.default_rng(16)
    u = rng.standard_normal((12, 8)).astype(np.float32)
    pi = rng.standard_normal((12, 8)).astype(np.float32)
    ni = rng.standard_normal((12, 8)).astype(np.float32)
    base = R.edge_BaseModel.__new__(R.edge_BaseModel)
    ref = R.edge_BaseModel._bpr_loss(base, torch.tensor(u), torch.tensor(pi),
                                     torch.tensor(ni)).item()
    ours = float(bpr_loss(jnp.asarray(u), jnp.asarray(pi), jnp.asarray(ni)))
    assert abs(ours - ref) < ATOL

    pos = rng.standard_normal(12).astype(np.float32)
    neg = rng.standard_normal((12, 4)).astype(np.float32)
    ref_nce = R.edge_BaseModel._nce_loss(base, torch.tensor(pos),
                                         torch.tensor(neg)).item()
    ours_nce = float(nce_loss(jnp.asarray(pos), jnp.asarray(neg)))
    assert abs(ours_nce - ref_nce) < ATOL


def _edge_stub(R, num_users, num_items):
    obj = R.edge_RAGraph.__new__(R.edge_RAGraph)
    obj.num_users = num_users
    obj.num_items = num_items
    return obj


def test_edge_binorm_parity(R):
    """_edge_binorm (modules/RAGraph.py:242-248) vs the binorm weights our
    loader precomputes (data/edgelist.py)."""
    from ragraph_tpu.data.edgelist import load_edge_dataset
    rng = np.random.default_rng(17)
    U, I, E = 7, 9, 40
    users = rng.integers(0, U, size=E)
    items = rng.integers(0, I, size=E)
    rows = [(int(u), int(i), 1) for u, i in zip(users, items)]
    ds = load_edge_dataset(rows, [(0, 0, 2)], has_time=True)
    assert ds.num_users == U or ds.num_users == users.max() + 1

    stub = _edge_stub(R, ds.num_users, ds.num_items)
    t_edges = torch.tensor(np.stack([users, items], axis=1))
    ref = R.edge_RAGraph._edge_binorm(stub, t_edges).numpy()

    ref_map = {}
    for (u, i, n) in zip(users, items, ref):
        ref_map[(u, i + ds.num_users)] = n
    checked = 0
    for s, r, w in zip(ds.senders, ds.receivers, ds.edge_norm):
        if (s, r) in ref_map:
            assert abs(w - ref_map[(s, r)]) < 1e-5
            checked += 1
    assert checked >= E // 2  # forward direction fully covered


def test_time_encoding_and_agg_parity(R):
    """_relative_edge_time_encoding + one _agg hop
    (modules/RAGraph.py:232-263) vs relative_time_encoding +
    lightgcn_propagate."""
    from ragraph_tpu.models.edge.base import (lightgcn_propagate,
                                              relative_time_encoding)
    rng = np.random.default_rng(18)
    U, I, E = 6, 8, 50
    n = U + I
    senders = rng.integers(0, U, size=E)
    receivers = rng.integers(U, n, size=E)
    times = rng.integers(0, 20, size=E).astype(np.int64)
    norm = rng.random(E).astype(np.float32)
    emb = rng.standard_normal((n, 8)).astype(np.float32)

    stub = _edge_stub(R, U, I)
    t_edges = torch.tensor(np.stack([senders, receivers], axis=1))
    ref_t = R.edge_RAGraph._relative_edge_time_encoding(
        stub, t_edges, torch.tensor(times)).numpy()
    ours_t = np.asarray(relative_time_encoding(
        jnp.asarray(times), jnp.asarray(receivers), n))
    np.testing.assert_allclose(ours_t, ref_t, atol=ATOL)

    blended = norm * 0.5 + ref_t * 0.5
    ref_h = R.edge_RAGraph._agg(stub, torch.tensor(emb), t_edges,
                                torch.tensor(blended)).numpy()
    ours_layers = lightgcn_propagate(
        jnp.asarray(emb), jnp.asarray(senders), jnp.asarray(receivers),
        jnp.asarray(blended), n, 1)
    np.testing.assert_allclose(np.asarray(ours_layers[1]), ref_h, atol=ATOL)


def test_metric_eval_protocol_parity(R):
    """Full Metric.eval protocol (utils/metrics.py:83-141): history masking,
    per-batch top-k, summed-then-averaged recall/ndcg/precision."""
    from ragraph_tpu.train.metrics import RankingEvaluator
    rng = np.random.default_rng(19)
    U, I, H = 10, 25, 8
    user_emb = rng.standard_normal((U, H)).astype(np.float32)
    item_emb = rng.standard_normal((I, H)).astype(np.float32)
    test_user_dict = {u: sorted(set(rng.integers(0, I, size=3).tolist()))
                      for u in range(0, U, 2)}
    user_hist_dict = {u: sorted(set(rng.integers(0, I, size=4).tolist()))
                      for u in range(U)}

    class FakeModel:
        def generate(self):
            return torch.tensor(user_emb), torch.tensor(item_emb)

        def rating(self, ue, ie):
            return ue @ ie.t()

    class FakeLoader:
        pass

    loader = FakeLoader()
    loader.test_user_dict = test_user_dict
    loader.user_hist_dict = user_hist_dict

    R.edge_args.metrics = "recall;ndcg;precision"
    R.edge_args.metrics_k = "3;5"
    R.edge_args.eval_batch_size = 3  # force multi-batch accumulation
    ref = R.edge_Metric().eval(FakeModel(), loader)

    ours = RankingEvaluator(metrics=("recall", "ndcg", "precision"),
                            ks=(3, 5), eval_batch_size=3,
                            topk_method="exact").evaluate(
        jnp.asarray(user_emb), jnp.asarray(item_emb),
        test_user_dict, user_hist_dict)
    for m in ("recall", "ndcg", "precision"):
        np.testing.assert_allclose(ours[m], ref[m], atol=1e-5)


def test_mrr_compat_parity(R):
    """``mrr_at_k(compat=True)`` reproduces the reference formula
    (utils/metrics.py:24-29) bit-for-bit — including its division by
    ``log2(1/1)=0`` at rank 1, which makes every row ``inf`` (rank-1 hit)
    or ``nan`` (rank-1 miss). The textbook default stays finite."""
    from ragraph_tpu.train.metrics import mrr_at_k
    rng = np.random.default_rng(23)
    k = 5
    cases = [
        rng.integers(0, 2, size=(7, k)).astype(float),   # mixed -> nan
        np.ones((4, k)),                                 # all rank-1 hits -> inf
        np.concatenate([np.ones((3, 1)), np.zeros((3, k - 1))], 1),
    ]
    for hits in cases:
        with np.errstate(divide="ignore", invalid="ignore"):
            ref = R.edge_Metric.mrr(None, hits, k)
        ours = mrr_at_k(hits, k, compat=True)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))
        # and the default stays the textbook finite value
        assert np.isfinite(mrr_at_k(hits, k))


def test_interpolative_merge_parity(R):
    """The staged fine-tune interpolative update (finetune_rag.py:70-86),
    executed from the reference source text."""
    from ragraph_tpu.models.edge.staged import interpolative_merge
    rng = np.random.default_rng(20)
    interval = 3
    mk = lambda: {"user_embedding": rng.standard_normal((6, 4)).astype(np.float32),
                  "item_embedding": rng.standard_normal((9, 4)).astype(np.float32)}
    pretrain = mk()
    recents = [mk() for _ in range(interval)]  # most-recent first

    all_state_dict = [{k: torch.tensor(v) for k, v in pretrain.items()}]
    for t in recents:
        all_state_dict.append({k: torch.tensor(v) for k, v in t.items()})
    ref = interpolative_merge_reference(all_state_dict, interval)

    ours = interpolative_merge(pretrain, recents, pretrain_weight=0.5)
    for k in ("user_embedding", "item_embedding"):
        np.testing.assert_allclose(np.asarray(ours[k]), ref[k].numpy(),
                                   atol=ATOL)


# ---------------------------------------------------------------------------
# Pipeline-level: library build -> retrieve against the reference's OWN
# ToyGraphBase (deterministic config: no augmentation, no inverse sampling)
# ---------------------------------------------------------------------------

def test_library_build_and_retrieve_pipeline_parity(R):
    """Chain parity: frozen encoder -> key normalize -> k-hop values ->
    compacting store -> cosine top-k retrieval must reproduce the
    reference ``ToyGraphBase`` (``_build_toy_graph_base`` + ``retrieve``,
    ``RAGraph_node/ragraph_utils/ToyGraphBase.py:47-119``) row-for-row on
    identical graphs with an identical frozen encoder."""
    import jax
    from ragraph_tpu.rag.library import (LibraryConfig, build_library,
                                         library_init, retrieve)

    rng = np.random.default_rng(42)
    n, f_dim, e_dim, c = 12, 7, 8, 3
    n_graphs, k = 2, c + 1
    w_enc = rng.standard_normal((f_dim, e_dim)).astype(np.float32) * 0.3

    feats = rng.standard_normal((n_graphs, n, f_dim)).astype(np.float32)
    adjs = np.stack([_rand_graph(rng, n) for _ in range(n_graphs)])
    # row-normalized adjacency as process_tu_dataset produces
    adjs = adjs / adjs.sum(axis=2, keepdims=True)
    label_idx = rng.integers(0, c, (n_graphs, n))
    onehot = np.eye(c, dtype=np.float32)[label_idx]

    # --- reference build + retrieve (pure-torch methods) ---
    class FrozenEncoder:
        def inference(self, features, adj):
            return features @ torch.tensor(w_enc)

    tb = R.node_ToyGraphBase(FrozenEncoder(), num_class=c, emb_size=e_dim,
                             query_graph_hop=2)   # toy_graph_hop = 1
    tb.num_inverse_sample = 0
    tb.num_augment_scale = 0
    tb.retrieve_num = k
    for g in range(n_graphs):
        tb._build_toy_graph_base(torch.tensor(feats[g]),
                                 torch.tensor(adjs[g]),
                                 torch.tensor(onehot[g]))

    # --- our build + retrieve ---
    cfg = LibraryConfig(num_inverse_sample=0, num_augment_scale=0,
                        retrieve_num=k, toy_graph_hop=1,
                        use_positions=False)
    lib = library_init(capacity=n_graphs * n, emb_size=e_dim,
                       num_classes=c)
    encoder_fn = lambda f, a: f @ jnp.asarray(w_enc)
    batch = {"features": jnp.asarray(feats), "adj": jnp.asarray(adjs),
             "labels": jnp.asarray(onehot),
             "node_mask": jnp.ones((n_graphs, n), bool)}
    lib = build_library(lib, encoder_fn, [batch], cfg, jax.random.key(0))

    assert int(lib.fill) == n_graphs * n
    np.testing.assert_allclose(np.asarray(lib.keys[:lib.capacity]),
                               tb.resource_keys.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(lib.values[:lib.capacity]),
                               tb.resource_values.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(lib.labels[:lib.capacity]),
                               tb.resource_labels.numpy(), atol=ATOL)

    # retrieval over the built store: same queries, same top-k rows
    queries = rng.standard_normal((5, e_dim)).astype(np.float32)
    ref_emb, ref_lab = tb.retrieve(torch.tensor(queries), None,
                                   add_noise=False)
    our_emb, our_lab = retrieve(lib, jnp.asarray(queries), cfg)
    np.testing.assert_allclose(np.asarray(our_emb), ref_emb.numpy(),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(our_lab), ref_lab.numpy(),
                               atol=ATOL)


def test_ragraph_forward_fusion_parity(R):
    """Full-forward parity: frozen encoder -> retrieve -> fusion
    (``query·(1-w) + Σ rag_emb·w`` -> decoder softmax -> label blend)
    against the reference ``RAGraph.forward``
    (``RAGraph_node/RAGraph.py:39-63``), finetune AND training-free
    paths, with the decoder weights copied across frameworks."""
    import types as _types
    import jax
    from ragraph_tpu.models.ragraph_node import (RAGraphNode,
                                                 RAGraphNodeConfig,
                                                 RAGraphNodeState)
    from ragraph_tpu.rag.library import (LibraryConfig, build_library,
                                         library_init)

    rng = np.random.default_rng(7)
    n, f_dim, e_dim, c = 10, 6, 8, 3
    hop = 3
    w_enc = rng.standard_normal((f_dim, e_dim)).astype(np.float32) * 0.3

    feats = rng.standard_normal((2, n, f_dim)).astype(np.float32)
    adjs = np.stack([_rand_graph(rng, n) for _ in range(2)])
    adjs = adjs / adjs.sum(axis=2, keepdims=True)
    onehot = np.eye(c, dtype=np.float32)[rng.integers(0, c, (2, n))]

    # reference: ToyGraphBase built deterministically + RAGraph via __new__
    class FrozenEncoder:
        def inference(self, features, adj):
            return features @ torch.tensor(w_enc)

    tb = R.node_ToyGraphBase(FrozenEncoder(), num_class=c, emb_size=e_dim,
                             query_graph_hop=hop)  # toy_graph_hop = 2
    tb.num_inverse_sample = 0
    tb.num_augment_scale = 0
    tb.retrieve_num = c + 1
    for g in range(2):
        tb._build_toy_graph_base(torch.tensor(feats[g]),
                                 torch.tensor(adjs[g]),
                                 torch.tensor(onehot[g]))
    torch.manual_seed(3)
    ref_decoder = R.node_TaskDecoder(e_dim, e_dim, c)

    ref = object.__new__(R.node_RAGraph)
    torch.nn.Module.__init__(ref)
    ref.emb_size, ref.num_class = e_dim, c
    ref.pretrain_model = FrozenEncoder()
    ref.retrieve_weight = ref.label_weight = 0.5
    ref.finetune, ref.noise_finetune = True, False
    ref.query_graph_hop = hop
    ref.toy_graph_base = tb
    ref.decoder = ref_decoder
    ref.eval()

    # ours: same frozen encoder (stubbed in), torch decoder weights copied
    cfg = RAGraphNodeConfig(
        emb_size=e_dim, num_class=c, query_graph_hop=hop,
        library=LibraryConfig(num_inverse_sample=0, num_augment_scale=0,
                              retrieve_num=c + 1, toy_graph_hop=hop - 1,
                              use_positions=False))
    model = RAGraphNode(cfg, feature_dim=f_dim)
    enc_stub = _types.SimpleNamespace(
        apply=lambda params, f, a, m=None, method=None: f @ jnp.asarray(
            w_enc),
        inference=None)
    model.encoder = enc_stub

    dec_params = {"params": {
        "Dense_0": {"kernel": jnp.asarray(
            ref_decoder.fc1.weight.detach().numpy().T),
            "bias": jnp.asarray(ref_decoder.fc1.bias.detach().numpy())},
        "Dense_1": {"kernel": jnp.asarray(
            ref_decoder.fc2.weight.detach().numpy().T),
            "bias": jnp.asarray(ref_decoder.fc2.bias.detach().numpy())},
    }}
    lib = library_init(2 * n, e_dim, c)
    lib = build_library(lib, lambda f, a: f @ jnp.asarray(w_enc),
                        [{"features": jnp.asarray(feats),
                          "adj": jnp.asarray(adjs),
                          "labels": jnp.asarray(onehot),
                          "node_mask": jnp.ones((2, n), bool)}],
                        cfg.library, jax.random.key(0))
    state = RAGraphNodeState(encoder_params=None, decoder_params=dec_params,
                             library=lib)

    from ragraph_tpu.core.graph import DenseGraph
    qf = rng.standard_normal((n, f_dim)).astype(np.float32)
    qa = _rand_graph(rng, n)
    qa = qa / qa.sum(axis=1, keepdims=True)
    graph = DenseGraph(features=jnp.asarray(qf), adj=jnp.asarray(qa),
                       labels=jnp.zeros((n, c)),
                       node_mask=jnp.ones((n,), bool),
                       graph_ids=jnp.zeros((n,), jnp.int32), num_graphs=1)

    with torch.no_grad():
        ref_out = ref(torch.tensor(qf), torch.tensor(qa)).numpy()
    ours = np.asarray(model.forward(state, graph))
    np.testing.assert_allclose(ours, ref_out, atol=1e-4)

    # training-free path (finetune=False): pure label vote
    ref.finetune = False
    with torch.no_grad():
        ref_tf = ref(torch.tensor(qf), torch.tensor(qa)).numpy()
    cfg_tf = RAGraphNodeConfig(
        emb_size=e_dim, num_class=c, query_graph_hop=hop, finetune=False,
        library=cfg.library)
    model_tf = RAGraphNode(cfg_tf, feature_dim=f_dim)
    model_tf.encoder = enc_stub
    ours_tf = np.asarray(model_tf.forward(state, graph))
    np.testing.assert_allclose(ours_tf, ref_tf, atol=1e-4)


def test_edge_ragraph_forward_rag_fusion_parity(R):
    """Full edge forward parity (phase='vanilla', RAG on): gated tables ->
    3 time-blended propagation hops -> chunked cosine top-k retrieval ->
    (1-w)·Σlayers + w·rag_mean fusion, vs the reference
    ``modules/RAGraph.py:265-332`` executing its own forward."""
    from ragraph_tpu.models.edge import (EdgeGraphArrays, EdgeModelConfig,
                                         RAGraphEdge)

    rng = np.random.default_rng(23)
    U, I, D, M, RES, k = 7, 8, 8, 30, 20, 4
    n = U + I
    u = rng.integers(0, U, M)
    it = rng.integers(U, n, M)
    send = np.concatenate([u, it]).astype(np.int32)
    recv = np.concatenate([it, u]).astype(np.int32)
    norm = rng.random(2 * M).astype(np.float32) + 0.1
    times = np.concatenate([rng.integers(0, 50, M)] * 2).astype(np.int64)
    user_emb = rng.standard_normal((U, D)).astype(np.float32)
    item_emb = rng.standard_normal((I, D)).astype(np.float32)
    res_keys = rng.standard_normal((RES, D)).astype(np.float32)
    res_vals = rng.standard_normal((RES, D)).astype(np.float32)

    # --- reference, via its own forward ---
    R.edge_args.num_layers = 3
    ref = object.__new__(R.edge_RAGraph)
    torch.nn.Module.__init__(ref)
    ref.num_users, ref.num_items, ref.emb_size = U, I, D
    ref.phase, ref.use_RAG, ref.use_noise = "vanilla", True, False
    ref.user_embedding = torch.nn.Parameter(torch.tensor(user_emb))
    ref.item_embedding = torch.nn.Parameter(torch.tensor(item_emb))
    ref.emb_gate = lambda x: x
    ref.retrieve_weight = 0.3
    ref.batch_size, ref.retrieve_num, ref.noise_retrieve_num = 7, k, 1
    ref.resource_keys = torch.tensor(res_keys)
    ref.resource_values = torch.tensor(res_vals)
    ref.eval()
    t_edges = torch.tensor(np.stack([send, recv], axis=1))
    with torch.no_grad():
        ref_u, ref_i = ref.forward(t_edges, torch.tensor(norm),
                                   torch.tensor(times))

    # --- ours ---
    g = EdgeGraphArrays(senders=jnp.asarray(send),
                        receivers=jnp.asarray(recv),
                        edge_norm=jnp.asarray(norm),
                        edge_times=jnp.asarray(times.astype(np.float32)),
                        num_users=U, num_items=I)
    cfg = EdgeModelConfig(emb_size=D, num_layers=3, retrieve_weight=0.3,
                          rag_chunk=7, retrieve_num=k, use_lora=False)
    model = RAGraphEdge(cfg, g, phase="vanilla")
    params = {"user_embedding": jnp.asarray(user_emb),
              "item_embedding": jnp.asarray(item_emb)}
    our_u, our_i = model.forward(
        params, resources=(jnp.asarray(res_keys), jnp.asarray(res_vals)))

    np.testing.assert_allclose(np.asarray(our_u), ref_u.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(our_i), ref_i.numpy(), atol=1e-4)


def test_graph_variant_library_build_parity(R):
    """Graph-level library build (mean-pooled keys/values, one-hot graph
    label) vs the reference graph-variant ``ToyGraphBase``
    (``RAGraph_graph/ragraph_utils/ToyGraphBase.py:98-131``)."""
    import jax
    from ragraph_tpu.rag.library import (LibraryConfig, build_library,
                                         library_init, retrieve)

    rng = np.random.default_rng(31)
    n, f_dim, e_dim, c = 9, 5, 8, 4
    w_enc = rng.standard_normal((f_dim, e_dim)).astype(np.float32) * 0.3
    feats = rng.standard_normal((3, n, f_dim)).astype(np.float32)
    adjs = np.stack([_rand_graph(rng, n) for _ in range(3)])
    adjs = adjs / adjs.sum(axis=2, keepdims=True)
    glabels = rng.integers(0, c, 3)

    class FrozenEncoder:
        def inference(self, features, adj):
            return features @ torch.tensor(w_enc)

    tb = R.graph_ToyGraphBase(FrozenEncoder(), num_class=c,
                              emb_size=e_dim, query_graph_hop=2)
    tb.num_inverse_sample = 0
    tb.num_augment_scale = 0
    tb.retrieve_num = 2
    for g in range(3):
        tb._build_toy_graph_base(torch.tensor(feats[g]),
                                 torch.tensor(adjs[g]),
                                 torch.tensor([glabels[g]]))

    cfg = LibraryConfig(level="graph", num_inverse_sample=0,
                        num_augment_scale=0, retrieve_num=2,
                        toy_graph_hop=1, use_positions=False,
                        noise_mode="gaussian")
    lib = library_init(8, e_dim, c)
    onehot_nodes = np.zeros((3, n, c), np.float32)   # node labels unused
    graph_onehot = np.eye(c, dtype=np.float32)[glabels]
    lib = build_library(
        lib, lambda f, a: f @ jnp.asarray(w_enc),
        [{"features": jnp.asarray(feats), "adj": jnp.asarray(adjs),
          "labels": jnp.asarray(onehot_nodes),
          "node_mask": jnp.ones((3, n), bool),
          "graph_onehot": jnp.asarray(graph_onehot)}],
        cfg, jax.random.key(0))

    assert int(lib.fill) == 3
    np.testing.assert_allclose(np.asarray(lib.keys[:3]),
                               tb.resource_keys.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(lib.values[:3]),
                               tb.resource_values.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(lib.labels[:3]),
                               tb.resource_labels.numpy(), atol=ATOL)


def test_fewshot_structure_weighted_retrieve_parity(R):
    """Fewshot variant retrieval: weighted structure+semantic scores
    (``RAGraph_node_fewshot/ragraph_utils/ToyGraphBase.py:47-79``) vs our
    structure-path retrieve, with the reference's internal random anchor
    draw mirrored under the same torch seed."""
    from ragraph_tpu.ops.shortest_path import anchor_distances
    from ragraph_tpu.rag.library import (LibraryConfig, ToyGraphLibrary,
                                         retrieve)

    rng = np.random.default_rng(33)
    q_n, res_n, e_dim, c, a = 8, 15, 6, 3, 4
    keys = rng.standard_normal((res_n, e_dim)).astype(np.float32)
    vals = rng.standard_normal((res_n, e_dim)).astype(np.float32)
    labels = np.eye(c, dtype=np.float32)[rng.integers(0, c, res_n)]
    positions = rng.random((res_n, a)).astype(np.float32)
    search_keys = rng.standard_normal((q_n, e_dim)).astype(np.float32)
    search_adj = _rand_graph(rng, q_n, p=0.3, self_loops=False)

    class NoEnc:
        pass

    tb = R.fewshot_ToyGraphBase(NoEnc(), num_class=c, emb_size=e_dim,
                                query_graph_hop=2, retrieve_num=3)
    tb.retrieve_num = 3
    tb.num_anchors, tb.dis_q = a, 5
    tb.structure_weight, tb.semantic_weight = 0.001, 0.999
    tb.resource_keys = torch.tensor(keys)
    tb.resource_values = torch.tensor(vals)
    tb.resource_labels = torch.tensor(labels)
    tb.resource_positions = torch.tensor(positions)
    torch.manual_seed(5)
    ref_emb, ref_lab = tb.retrieve(torch.tensor(search_keys),
                                   torch.tensor(search_adj),
                                   add_noise=False)

    # mirror the internal anchor draw to build identical search positions
    torch.manual_seed(5)
    anchors = torch.randint(low=0, high=q_n, size=(a,)).numpy()
    dist = np.asarray(anchor_distances(jnp.asarray(search_adj),
                                       jnp.asarray(anchors), num_hops=5))
    search_pos = np.where(dist < 5, 1.0 / (dist + 1.0), 0.0)

    cfg = LibraryConfig(retrieve_num=3, structure_weight=0.001,
                        semantic_weight=0.999, num_anchors=a, dis_q=5)
    lib = ToyGraphLibrary(
        keys=jnp.asarray(np.vstack([keys, np.zeros((1, e_dim),
                                                   np.float32)])),
        values=jnp.asarray(np.vstack([vals, np.zeros((1, e_dim),
                                                     np.float32)])),
        labels=jnp.asarray(np.vstack([labels, np.zeros((1, c),
                                                       np.float32)])),
        positions=jnp.asarray(np.vstack([positions,
                                         np.zeros((1, a), np.float32)])),
        fill=jnp.asarray(res_n, jnp.int32), capacity=res_n)
    our_emb, our_lab = retrieve(
        lib, jnp.asarray(search_keys), cfg,
        search_positions=jnp.asarray(search_pos.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(our_emb), ref_emb.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(our_lab), ref_lab.numpy(),
                               atol=1e-4)


def test_graphprompt_gp_forward_parity(R):
    """GraphPrompt/GPF edge baselines: the prompt-vector forward
    (``RAGraph_edge/modules/graphprompt/GP.py:45-75``) vs
    ``GraphPromptEdge.forward``, both prompt modes."""
    from ragraph_tpu.models.edge import EdgeGraphArrays, EdgeModelConfig
    from ragraph_tpu.models.edge.graphprompt import GraphPromptEdge

    rng = np.random.default_rng(29)
    U, I, D, M = 6, 9, 8, 40
    n = U + I
    u = rng.integers(0, U, M)
    it = rng.integers(U, n, M)
    send = np.concatenate([u, it]).astype(np.int32)
    recv = np.concatenate([it, u]).astype(np.int32)
    norm = rng.random(2 * M).astype(np.float32) + 0.1
    user_emb = rng.standard_normal((U, D)).astype(np.float32)
    item_emb = rng.standard_normal((I, D)).astype(np.float32)
    prompt = rng.standard_normal((1, D)).astype(np.float32)

    g = EdgeGraphArrays(senders=jnp.asarray(send),
                        receivers=jnp.asarray(recv),
                        edge_norm=jnp.asarray(norm),
                        edge_times=jnp.zeros(2 * M, jnp.float32),
                        num_users=U, num_items=I)
    cfg = EdgeModelConfig(emb_size=D, num_layers=3)
    R.edge_args.num_layers = 3

    for mode in ("graphprompt", "gpf"):
        ref = object.__new__(R.edge_GP)
        torch.nn.Module.__init__(ref)
        ref.num_users, ref.num_items = U, I
        ref.phase = "finetune"
        ref.user_embedding = torch.nn.Parameter(torch.tensor(user_emb))
        ref.item_embedding = torch.nn.Parameter(torch.tensor(item_emb))
        ref.prompt_vec = torch.nn.Parameter(torch.tensor(prompt))
        if mode == "graphprompt":
            ref.prompt_func = lambda x: torch.mul(x, ref.prompt_vec)
        else:
            ref.prompt_func = lambda x: x + ref.prompt_vec
        R.edge_args.f_model = mode
        t_edges = torch.tensor(np.stack([send, recv], axis=1))
        with torch.no_grad():
            ru, ri = ref.forward(t_edges, torch.tensor(norm))

        model = GraphPromptEdge(cfg, g, phase="finetune", prompt_mode=mode)
        params = {"user_embedding": jnp.asarray(user_emb),
                  "item_embedding": jnp.asarray(item_emb),
                  "prompt_vec": jnp.asarray(prompt)}
        ou, oi = model.forward(params)
        np.testing.assert_allclose(np.asarray(ou), ru.numpy(), atol=1e-4,
                                   err_msg=mode)
        np.testing.assert_allclose(np.asarray(oi), ri.numpy(), atol=1e-4,
                                   err_msg=mode)


def test_mixgcf_negative_mixing_and_reg_parity(R, monkeypatch):
    """MixGCF's positive-mixing + hop-mixing hard-negative synthesis
    (``modules/plugins/MixGCF.py:59-77``) and its reg term
    (``:98`` — the FULL flat (B·n_negs) candidate tensor goes into
    ``_reg_loss``, still divided by B) vs ours, on identical layer
    stacks with the mixing coefficient pinned to 0.5 on both sides."""
    from ragraph_tpu.models.edge.base import reg_loss_emb
    from ragraph_tpu.models.edge.plugins import MixGCFPlugin

    rng = np.random.default_rng(57)
    n_users, n_items, layers_p1, emb, b, n_negs = 11, 17, 4, 8, 6, 5
    u_layers = rng.standard_normal(
        (n_users, layers_p1, emb)).astype(np.float32)
    i_layers = rng.standard_normal(
        (n_items, layers_p1, emb)).astype(np.float32)
    users = rng.integers(0, n_users, b)
    pos = rng.integers(0, n_items, b)
    cands = rng.integers(0, n_items, (b, n_negs))

    a = R.edge_args
    monkeypatch.setattr(a, "n_negs", n_negs, raising=False)
    monkeypatch.setattr(a, "emb_size", emb, raising=False)
    monkeypatch.setattr(torch, "rand",
                        lambda *s, **k: torch.full(s, 0.5))
    # unbound: negative_sampling reads only args + its operands
    ref_neg = R.edge_MixGCF.negative_sampling(
        None, torch.tensor(u_layers), torch.tensor(i_layers),
        torch.tensor(users), torch.tensor(cands.reshape(-1)),
        torch.tensor(pos)).detach().numpy()

    monkeypatch.setattr(jax.random, "uniform",
                        lambda key, shape, **k: jnp.full(shape, 0.5))
    ours_neg = np.asarray(MixGCFPlugin._mix_negatives(
        None, jnp.asarray(u_layers), jnp.asarray(i_layers),
        jnp.asarray(users), jnp.asarray(cands), jnp.asarray(pos),
        jax.random.key(0)))
    np.testing.assert_allclose(ours_neg, ref_neg, atol=1e-5)

    # reg parity: GraphPro._reg_loss formula over the flat candidates
    u_t = rng.standard_normal((n_users, emb)).astype(np.float32)
    i_t = rng.standard_normal((n_items, emb)).astype(np.float32)
    ref_reg = float((0.5 * (torch.tensor(u_t)[torch.tensor(users)]
                            .norm(2).pow(2)
                            + torch.tensor(i_t)[torch.tensor(pos)]
                            .norm(2).pow(2)
                            + torch.tensor(i_t)[torch.tensor(
                                cands.reshape(-1))].norm(2).pow(2))
                    / float(b)))
    ours_reg = float(reg_loss_emb(jnp.asarray(u_t), jnp.asarray(i_t),
                                  jnp.asarray(users), jnp.asarray(pos),
                                  jnp.asarray(cands.reshape(-1))))
    assert abs(ours_reg - ref_reg) < 1e-4 * max(1.0, abs(ref_reg))


def test_gru_cell_torch_parity(R):
    """The dynamic models' functional GRU must match ``torch.nn.GRUCell``
    bit-for-bit semantics (gate ordering r,z,n; reset applied inside the
    candidate's hidden term) — the cell under ROLAND / EvolveGCN-H/-O
    (``modules/dynamicGNN/roland.py:115-133``, ``evolveGCN_*.py``)."""
    from ragraph_tpu.models.edge.dynamic import gru_cell

    rng = np.random.default_rng(37)
    h_dim, b = 16, 5
    cell = torch.nn.GRUCell(h_dim, h_dim)
    x = rng.standard_normal((b, h_dim)).astype(np.float32)
    h = rng.standard_normal((b, h_dim)).astype(np.float32)
    with torch.no_grad():
        ref = cell(torch.tensor(x), torch.tensor(h)).numpy()

    params = {"w_ih": jnp.asarray(cell.weight_ih.detach().numpy()),
              "w_hh": jnp.asarray(cell.weight_hh.detach().numpy()),
              "b_ih": jnp.asarray(cell.bias_ih.detach().numpy()),
              "b_hh": jnp.asarray(cell.bias_hh.detach().numpy())}
    ours = np.asarray(gru_cell(params, jnp.asarray(x), jnp.asarray(h)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_lora_svd_init_and_gate_parity(R):
    """LoRA SVD factor initialization (``modules/RAGraph.py:130-155``)
    and the learned gate (``:171``) vs ours, on identical weights.

    SVD sign conventions differ between frameworks, so the factor
    PRODUCT A@B (the rank-r approximation, which is what enters the
    forward) is compared, not the factors."""
    from ragraph_tpu.nn.gating import learned_gate
    from ragraph_tpu.nn.lora import svd_init

    rng = np.random.default_rng(43)
    n, d, r = 20, 12, 4
    table = rng.standard_normal((n, d)).astype(np.float32)

    U, S, V = torch.svd(torch.tensor(table))
    ref_ab = ((U[:, :r] @ torch.diag(S[:r])) @ V[:, :r].t()).numpy()
    a, b = svd_init(jnp.asarray(table), r)
    np.testing.assert_allclose(np.asarray(a @ b), ref_ab, atol=1e-4)

    gw = rng.standard_normal((d, d)).astype(np.float32)
    gb = rng.standard_normal((1, d)).astype(np.float32)
    x = rng.standard_normal((n, d)).astype(np.float32)
    tx = torch.tensor(x)
    ref_gate = (tx * torch.sigmoid(
        tx @ torch.tensor(gw) + torch.tensor(gb))).numpy()
    ours = np.asarray(learned_gate(jnp.asarray(x), jnp.asarray(gw),
                                   jnp.asarray(gb), 0.0, None))
    np.testing.assert_allclose(ours, ref_gate, atol=1e-5)


@pytest.mark.parametrize("frozen_factors", [False, True],
                         ids=["trained-AB", "frozen-AB"])
def test_lora_finetune_trajectory_parity(R, frozen_factors):
    """VERDICT r2 #2 + r4 frozen-factor finding: N Adam steps of
    LoRA-default fine-tuning (``modules/RAGraph.py:122-160`` ``:269-271``
    ``:335-355``) on identical data/weights in torch and JAX — per-step
    losses and the final EFFECTIVE tables (base + A@B) must match.

    ``frozen_factors=True`` is the reference DRIVER's real dynamics: its
    A/B factors are plain tensors (never ``nn.Parameter``), so
    ``optim.Adam(model.parameters())`` (``utils/trainer.py:19-21``)
    excludes them and the SVD delta is a frozen additive bias; the torch
    arm here builds exactly that optimizer set, ours uses
    ``lora_train_factors=False``. ``False`` is classic trained-factor
    LoRA (both frameworks opt the factors in by hand).
    Determinism: edge_dropout=0 (EdgelistDrop keep=1 is exact),
    emb_dropout=0, renorm time mode, no noise."""
    from ragraph_tpu.models.edge import (EdgeGraphArrays, EdgeModelConfig,
                                         RAGraphEdge)
    from ragraph_tpu.nn.lora import LoRAFactors

    rng = np.random.default_rng(59)
    U, I, D, M, RES, k, r = 7, 8, 8, 30, 20, 4, 3
    n = U + I
    u = rng.integers(0, U, M)
    it = rng.integers(U, n, M)
    send = np.concatenate([u, it]).astype(np.int32)
    recv = np.concatenate([it, u]).astype(np.int32)
    norm = rng.random(2 * M).astype(np.float32) + 0.1
    times = np.concatenate([rng.integers(0, 50, M)] * 2).astype(np.int64)
    user_emb = rng.standard_normal((U, D)).astype(np.float32)
    item_emb = rng.standard_normal((I, D)).astype(np.float32)
    res_keys = rng.standard_normal((RES, D)).astype(np.float32)
    res_vals = rng.standard_normal((RES, D)).astype(np.float32)
    gw = (rng.standard_normal((D, D)) * 0.1).astype(np.float32)
    gb = (rng.standard_normal((1, D)) * 0.1).astype(np.float32)
    B = 6
    b_users = rng.integers(0, U, B).astype(np.int64)
    b_pos = rng.integers(0, I, B).astype(np.int64)
    b_neg = rng.integers(0, I, B).astype(np.int64)
    lr, wd, steps = 1e-2, 1e-4, 5

    # --- ours first (the SVD factors are copied into torch so only the
    # TRAINING trajectory is under test; SVD init parity is covered by
    # test_lora_svd_init_and_gate_parity) ---
    g = EdgeGraphArrays(senders=jnp.asarray(send),
                        receivers=jnp.asarray(recv),
                        edge_norm=jnp.asarray(norm),
                        edge_times=jnp.asarray(times.astype(np.float32)),
                        num_users=U, num_items=I)
    cfg = EdgeModelConfig(emb_size=D, num_layers=3, retrieve_weight=0.3,
                          rag_chunk=7, retrieve_num=k, use_lora=True,
                          lora_rank=r, edge_dropout=0.0, emb_dropout=0.0,
                          weight_decay=wd, time_mode="renorm", lr=lr,
                          lora_init_scale=1.0,  # the reference's SVD init
                          lora_train_factors=not frozen_factors)
    model = RAGraphEdge(cfg, g, phase="finetune")
    params = model.init_params(
        jax.random.key(0),
        pretrained_tables=(jnp.asarray(user_emb), jnp.asarray(item_emb)))
    params["gating_weight"] = jnp.asarray(gw)
    params["gating_bias"] = jnp.asarray(gb)
    resources = (jnp.asarray(res_keys), jnp.asarray(res_vals))
    batch = (jnp.asarray(b_users.astype(np.int32)),
             jnp.asarray(b_pos.astype(np.int32)),
             jnp.asarray(b_neg.astype(np.int32)))

    import optax
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    our_losses = []
    key = jax.random.key(7)  # consumed only by inert dropout paths

    def loss_fn(p):
        return model.cal_loss(p, batch, key, resources=resources)[0]

    for _ in range(steps):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        our_losses.append(float(loss))
    our_u_eff = np.asarray(params["user_embedding"]
                           + params["user_lora"][0] @ params["user_lora"][1])
    our_i_eff = np.asarray(params["item_embedding"]
                           + params["item_lora"][0] @ params["item_lora"][1])

    # --- reference ---
    R.edge_args.num_layers = 3
    R.edge_args.edge_dropout = 0.0
    R.edge_args.emb_dropout = 0.0
    R.edge_args.weight_decay = wd
    ref = object.__new__(R.edge_RAGraph)
    torch.nn.Module.__init__(ref)
    ref.num_users, ref.num_items, ref.emb_size = U, I, D
    ref.phase, ref.use_RAG, ref.use_noise, ref.use_LoRA = \
        "finetune", True, False, True
    ref.retrieve_weight = 0.3
    ref.batch_size, ref.retrieve_num, ref.noise_retrieve_num = 7, k, 1
    ref.resource_keys = torch.tensor(res_keys)
    ref.resource_values = torch.tensor(res_vals)
    ref.user_embedding = torch.nn.Parameter(torch.tensor(user_emb))
    ref.item_embedding = torch.nn.Parameter(torch.tensor(item_emb))
    # copy OUR svd factors (sign conventions differ; A@B is identical)
    init_lora = model.init_params(
        jax.random.key(0), pretrained_tables=(jnp.asarray(user_emb),
                                              jnp.asarray(item_emb)))
    ref.user_embedding_A = torch.tensor(
        np.asarray(init_lora["user_lora"][0])).requires_grad_(True)
    ref.user_embedding_B = torch.tensor(
        np.asarray(init_lora["user_lora"][1])).requires_grad_(True)
    ref.item_embedding_A = torch.tensor(
        np.asarray(init_lora["item_lora"][0])).requires_grad_(True)
    ref.item_embedding_B = torch.tensor(
        np.asarray(init_lora["item_lora"][1])).requires_grad_(True)
    ref.gating_weight = torch.nn.Parameter(torch.tensor(gw))
    ref.gating_bias = torch.nn.Parameter(torch.tensor(gb))
    ref.emb_dropout = torch.nn.Dropout(0.0)
    ref.lora_dropout = torch.nn.Dropout(0.0)
    ref.emb_gate = lambda x: ref.emb_dropout(
        x * torch.sigmoid(x @ ref.gating_weight + ref.gating_bias))
    ref.edges = torch.tensor(np.stack([send, recv], axis=1))
    ref.edge_norm = torch.tensor(norm)
    ref.edge_times = torch.tensor(times)
    ref.edge_dropout = R.edge_utils.EdgelistDrop()
    ref.train()
    # frozen arm = what model.parameters() actually yields in the
    # reference (plain-tensor A/B excluded); trained arm opts them in
    topt_params = [ref.user_embedding, ref.item_embedding,
                   ref.gating_weight, ref.gating_bias]
    if not frozen_factors:
        topt_params += [ref.user_embedding_A, ref.user_embedding_B,
                        ref.item_embedding_A, ref.item_embedding_B]
    topt = torch.optim.Adam(topt_params, lr=lr)
    ref_losses = []
    tb = (torch.tensor(b_users), torch.tensor(b_pos), torch.tensor(b_neg))
    for _ in range(steps):
        loss, _ = ref.cal_loss(tb)
        topt.zero_grad()
        loss.backward()
        topt.step()
        ref_losses.append(float(loss))
    ref_u_eff = (ref.user_embedding
                 + ref.user_embedding_A @ ref.user_embedding_B
                 ).detach().numpy()
    ref_i_eff = (ref.item_embedding
                 + ref.item_embedding_A @ ref.item_embedding_B
                 ).detach().numpy()

    np.testing.assert_allclose(our_losses, ref_losses, atol=5e-4)
    np.testing.assert_allclose(our_u_eff, ref_u_eff, atol=2e-3)
    np.testing.assert_allclose(our_i_eff, ref_i_eff, atol=2e-3)


def test_fewshot_ragraph_forward_parity(R):
    """Fewshot top-level forward: encode -> retrieve -> prototype logits
    ``protos[argmax(rag_labels)]`` -> fusion -> decode blend, executing
    the reference's own ``RAGraph_node_fewshot/RAGraph.py:47-83`` class
    (instantiated via __new__ around a deterministically-populated
    ToyGraphBase; structure weight 0 so its internal random anchor draw
    is inert — the structure term has its own parity test)."""
    import dataclasses as _dc
    from ragraph_tpu.models.ragraph_fewshot import (RAGraphFewshot,
                                                    RAGraphFewshotConfig)
    from ragraph_tpu.rag.library import ToyGraphLibrary
    from ragraph_tpu.models.ragraph_fewshot import fewshot_library_config

    rng = np.random.default_rng(51)
    n, f_dim, e_dim, c, res_n, k = 11, 6, 8, 3, 18, 4
    hop = 3
    w_enc = rng.standard_normal((f_dim, e_dim)).astype(np.float32) * 0.3
    w_dec = rng.standard_normal((e_dim, e_dim)).astype(np.float32) * 0.3
    protos = rng.standard_normal((c, e_dim)).astype(np.float32)
    keys_r = rng.standard_normal((res_n, e_dim)).astype(np.float32)
    vals_r = rng.standard_normal((res_n, e_dim)).astype(np.float32)
    labels_r = np.eye(c, dtype=np.float32)[rng.integers(0, c, res_n)]
    qf = rng.standard_normal((n, f_dim)).astype(np.float32)
    qa = _rand_graph(rng, n)
    qa = qa / qa.sum(axis=1, keepdims=True)

    class Stub:
        def encode(self, features, adj):
            return features @ torch.tensor(w_enc)

        def decode(self, hidden, adj):
            return hidden @ torch.tensor(w_dec)

    tb = R.fewshot_ToyGraphBase(Stub(), num_class=c, emb_size=e_dim,
                                query_graph_hop=hop, retrieve_num=k)
    tb.retrieve_num = k
    tb.structure_weight, tb.semantic_weight = 0.0, 0.999
    tb.num_anchors, tb.dis_q = 4, 5
    tb.resource_keys = torch.tensor(keys_r)
    tb.resource_values = torch.tensor(vals_r)
    tb.resource_labels = torch.tensor(labels_r)
    tb.resource_positions = torch.tensor(
        rng.random((res_n, 4)).astype(np.float32))

    ref = object.__new__(R.fewshot_RAGraph)
    torch.nn.Module.__init__(ref)
    ref.emb_size = e_dim
    ref.pretrain_model = Stub()
    ref.retrieve_weight = ref.label_weight = 0.5   # ENZYMES knobs
    ref.finetune, ref.noise_finetune = True, False
    ref.query_graph_hop = hop
    ref.toy_graph_base = tb
    ref.eval()
    with torch.no_grad():
        ref_ft = ref(torch.tensor(qf), torch.tensor(qa),
                     torch.tensor(protos)).numpy()
    ref.finetune = False
    with torch.no_grad():
        ref_tf = ref(torch.tensor(qf), torch.tensor(qa),
                     torch.tensor(protos)).numpy()

    libcfg = fewshot_library_config(retrieve_num=k, structure_weight=0.0,
                                    use_positions=False,
                                    num_inverse_sample=0,
                                    num_augment_scale=0)
    cfg = RAGraphFewshotConfig(emb_size=e_dim, num_class=c,
                               query_graph_hop=hop, library=libcfg)
    model = RAGraphFewshot(cfg, feature_dim=f_dim)
    model._encode = lambda params, f, a, m=None: f @ jnp.asarray(w_enc)
    model._decode = lambda params, h, a, m=None: h @ jnp.asarray(w_dec)
    pad = lambda x: np.vstack([x, np.zeros((1,) + x.shape[1:], np.float32)])
    lib = ToyGraphLibrary(
        keys=jnp.asarray(pad(keys_r)), values=jnp.asarray(pad(vals_r)),
        labels=jnp.asarray(pad(labels_r)),
        positions=jnp.zeros((res_n + 1, libcfg.num_anchors)),
        fill=jnp.asarray(res_n, jnp.int32), capacity=res_n)

    ours_ft = np.asarray(model._fuse_one(
        None, lib, jnp.asarray(protos), jnp.asarray(qf), jnp.asarray(qa),
        jnp.ones((n,), bool), training=False, key=None))
    np.testing.assert_allclose(ours_ft, ref_ft, atol=1e-4)

    model_tf = RAGraphFewshot(_dc.replace(cfg, finetune=False),
                              feature_dim=f_dim)
    model_tf._encode = model._encode
    model_tf._decode = model._decode
    ours_tf = np.asarray(model_tf._fuse_one(
        None, lib, jnp.asarray(protos), jnp.asarray(qf), jnp.asarray(qa),
        jnp.ones((n,), bool), training=False, key=None))
    np.testing.assert_allclose(ours_tf, ref_tf, atol=1e-4)


def test_graph_ragraph_forward_parity(R):
    """Graph-level top-level forward: mean-pooled query -> retrieve ->
    fusion -> decoder-softmax blend, executing the reference's own
    ``RAGraph_graph/RAGraph.py:49-76`` class around a deterministic
    ToyGraphBase, finetune and training-free paths."""
    import types as _types
    import dataclasses as _dc
    from ragraph_tpu.models.ragraph_graph import (RAGraphGraph,
                                                  RAGraphGraphConfig)
    from ragraph_tpu.models.ragraph_node import RAGraphNodeState
    from ragraph_tpu.rag.library import LibraryConfig, ToyGraphLibrary

    rng = np.random.default_rng(57)
    n, f_dim, e_dim, c, res_n, k = 9, 5, 8, 3, 14, 3
    hop = 2
    w_enc = rng.standard_normal((f_dim, e_dim)).astype(np.float32) * 0.3
    keys_r = rng.standard_normal((res_n, e_dim)).astype(np.float32)
    vals_r = rng.standard_normal((res_n, e_dim)).astype(np.float32)
    labels_r = np.eye(c, dtype=np.float32)[rng.integers(0, c, res_n)]
    qf = rng.standard_normal((n, f_dim)).astype(np.float32)
    qa = _rand_graph(rng, n)
    qa = qa / qa.sum(axis=1, keepdims=True)

    class Stub:
        def inference(self, features, adj):
            return features @ torch.tensor(w_enc)

    tb = R.graph_ToyGraphBase(Stub(), num_class=c, emb_size=e_dim,
                              query_graph_hop=hop)
    tb.retrieve_num = k
    tb.resource_keys = torch.tensor(keys_r)
    tb.resource_values = torch.tensor(vals_r)
    tb.resource_labels = torch.tensor(labels_r)
    torch.manual_seed(9)
    ref_decoder = R.node_TaskDecoder(e_dim, e_dim, c)

    ref = object.__new__(R.graph_RAGraph)
    torch.nn.Module.__init__(ref)
    ref.emb_size, ref.num_class = e_dim, c
    ref.pretrain_model = Stub()
    ref.retrieve_weight = ref.label_weight = 0.3
    ref.finetune, ref.noise_finetune = True, False
    ref.query_graph_hop = hop
    ref.toy_graph_base = tb
    ref.decoder = ref_decoder
    ref.eval()
    with torch.no_grad():
        ref_ft = ref(torch.tensor(qf), torch.tensor(qa)).numpy()
    ref.finetune = False
    with torch.no_grad():
        ref_tf = ref(torch.tensor(qf), torch.tensor(qa)).numpy()

    libcfg = LibraryConfig(level="graph", num_inverse_sample=0,
                           num_augment_scale=0, retrieve_num=k,
                           toy_graph_hop=hop - 1, use_positions=False,
                           noise_mode="gaussian")
    cfg = RAGraphGraphConfig(emb_size=e_dim, num_class=c,
                             query_graph_hop=hop, retrieve_weight=0.3,
                             label_weight=0.3, library=libcfg)
    model = RAGraphGraph(cfg, feature_dim=f_dim)
    model.encoder = _types.SimpleNamespace(
        apply=lambda params, f, a, m=None, method=None: f @ jnp.asarray(
            w_enc),
        inference=None)
    dec_params = {"params": {
        "Dense_0": {"kernel": jnp.asarray(
            ref_decoder.fc1.weight.detach().numpy().T),
            "bias": jnp.asarray(ref_decoder.fc1.bias.detach().numpy())},
        "Dense_1": {"kernel": jnp.asarray(
            ref_decoder.fc2.weight.detach().numpy().T),
            "bias": jnp.asarray(ref_decoder.fc2.bias.detach().numpy())},
    }}
    pad = lambda x: np.vstack([x, np.zeros((1,) + x.shape[1:], np.float32)])
    lib = ToyGraphLibrary(
        keys=jnp.asarray(pad(keys_r)), values=jnp.asarray(pad(vals_r)),
        labels=jnp.asarray(pad(labels_r)),
        positions=jnp.zeros((res_n + 1, libcfg.num_anchors)),
        fill=jnp.asarray(res_n, jnp.int32), capacity=res_n)
    state = RAGraphNodeState(encoder_params=None, decoder_params=dec_params,
                             library=lib)
    batch = {"features": jnp.asarray(qf)[None], "adj": jnp.asarray(qa)[None],
             "node_mask": jnp.ones((1, n), bool)}

    ours_ft = np.asarray(model.forward(state, batch))
    np.testing.assert_allclose(ours_ft, ref_ft, atol=1e-4)

    model_tf = RAGraphGraph(_dc.replace(cfg, finetune=False),
                            feature_dim=f_dim)
    model_tf.encoder = model.encoder
    ours_tf = np.asarray(model_tf.forward(state, batch))
    np.testing.assert_allclose(ours_tf, ref_tf, atol=1e-4)
