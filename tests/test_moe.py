"""Sparse-MoE decoder family (Mixtral / Qwen3-MoE).

The reference serves MoE checkpoints through AutoModelForCausalLM +
bitsandbytes (``RAGHelper_local.py:61-89``); here the family is first-class
(models/decoder.py LlamaMoeMlp + ops/moe_matmul.py). Golden parity runs
against REAL transformers torch forwards (same harness as
test_hf_parity.py), the gather kernel is checked against a per-slot oracle,
and expert parallelism (stacked experts sharded over the 'model' mesh axis)
must be output-identical to the single-device forward.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ragmeup_tpu.models.hf_loader import (  # noqa: E402
    llama_config_from_hf, llama_params_from_hf, load_safetensors,
    quantize_decoder_params)

IDS = [1, 17, 9, 42, 7, 23, 5, 11, 3, 29, 13, 2]


def _save_tiny_mixtral(tmp_path):
    hf_cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, torch_dtype="float32")
    torch.manual_seed(0)
    model = transformers.MixtralForCausalLM(hf_cfg).eval()
    d = tmp_path / "ckpt"
    model.save_pretrained(str(d), safe_serialization=True)
    with torch.no_grad():
        golden = model(torch.tensor([IDS])).logits[0].numpy()
    return str(d), golden, model


def _our_logits(ckpt_dir, quantization="none"):
    from ragmeup_tpu.models.decoder import LlamaModel, causal_bias
    cfg = llama_config_from_hf(ckpt_dir)
    cfg = dataclasses.replace(cfg, dtype="float32",
                              quantization=quantization)
    tensors = load_safetensors(ckpt_dir)
    params = llama_params_from_hf(tensors, cfg.num_layers, cfg.tie_embeddings)
    if quantization == "int8":
        params = quantize_decoder_params(params, bits=8,
                                         embeddings_bf16=False)
    model = LlamaModel(cfg)
    ids = jnp.asarray([IDS], jnp.int32)
    out = model.apply({"params": params}, ids,
                      positions=jnp.arange(len(IDS)),
                      attn_bias=causal_bias(len(IDS), len(IDS)))
    return np.asarray(out["logits"][0], np.float32), cfg


def test_mixtral_logits_match_hf(tmp_path):
    """Full-sequence fp32 logits parity with torch MixtralForCausalLM —
    router softmax/top-2/renorm and the all-experts combine included."""
    d, golden, _ = _save_tiny_mixtral(tmp_path)
    ours, cfg = _our_logits(d)
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    np.testing.assert_allclose(ours, golden, atol=3e-4, rtol=3e-4)


def test_mixtral_grouped_path_matches_hf(tmp_path):
    """The forced grouped-GEMM prefill path (moe_grouped='on' — sort by
    expert, grouped matmuls, unsort) is the same math: HF parity holds
    through it too."""
    import dataclasses as dc
    from ragmeup_tpu.models.decoder import LlamaModel, causal_bias
    d, golden, _ = _save_tiny_mixtral(tmp_path)
    cfg = dc.replace(llama_config_from_hf(d), dtype="float32",
                     moe_grouped="on")
    tensors = load_safetensors(d)
    params = llama_params_from_hf(tensors, cfg.num_layers,
                                  cfg.tie_embeddings)
    out = LlamaModel(cfg).apply(
        {"params": params}, jnp.asarray([IDS], jnp.int32),
        positions=jnp.arange(len(IDS)),
        attn_bias=causal_bias(len(IDS), len(IDS)))
    np.testing.assert_allclose(np.asarray(out["logits"][0], np.float32),
                               golden, atol=3e-4, rtol=3e-4)


def test_mixtral_int8_close_to_hf(tmp_path):
    """int8 stacked-expert quantization keeps the torch golden ranking."""
    d, golden, _ = _save_tiny_mixtral(tmp_path)
    ours, _ = _our_logits(d, quantization="int8")
    assert np.corrcoef(golden[-1], ours[-1])[0, 1] > 0.99


def test_qwen3_moe_logits_match_hf(tmp_path):
    """Qwen3-MoE: qk-norm attention + moe_intermediate_size + a dense
    mlp_only layer in the middle — the per-layer MoE flags must route
    exactly like HF Qwen3MoeDecoderLayer."""
    hf_cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        moe_intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        mlp_only_layers=[1], norm_topk_prob=True,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, torch_dtype="float32")
    torch.manual_seed(1)
    model = transformers.Qwen3MoeForCausalLM(hf_cfg).eval()
    d = tmp_path / "ckpt"
    model.save_pretrained(str(d), safe_serialization=True)
    with torch.no_grad():
        golden = model(torch.tensor([IDS])).logits[0].numpy()
    ours, cfg = _our_logits(str(d))
    assert cfg.moe_layers == (True, False, True)
    assert cfg.moe_intermediate_size == 96 and cfg.qk_norm
    np.testing.assert_allclose(ours, golden, atol=3e-4, rtol=3e-4)
    # int8 streaming loader must handle the MoE/dense layer mix (stacked
    # per-expert quantization on MoE layers, QuantDense on the dense one)
    import json
    from ragmeup_tpu.models.hf_loader import load_local_llm
    with open(f"{d}/generation_config.json", "w") as fh:
        json.dump({"eos_token_id": 999}, fh)
    llm8 = load_local_llm(str(d), quantization="int8")
    out8 = llm8.generate(IDS, max_new_tokens=4, temperature=0.0,
                         repetition_penalty=1.0)
    assert len(out8) == 4


def test_moe_decode_gather_path_matches_dense_path(tmp_path):
    """The decode path (t·k ≤ E: expert-gathered matmuls) and the
    prefill path (all-experts einsum + one-hot combine) are the same
    math — a single token through each must agree."""
    from ragmeup_tpu.models.decoder import LlamaConfig, LlamaMoeMlp
    cfg = LlamaConfig(vocab_size=64, hidden_size=64, num_layers=1,
                      num_heads=4, num_kv_heads=2, intermediate_size=96,
                      num_experts=4, num_experts_per_tok=2,
                      dtype="float32")
    mlp = LlamaMoeMlp(cfg)
    rng = np.random.default_rng(3)
    x1 = jnp.asarray(rng.standard_normal((1, 1, 64)), jnp.float32)
    params = mlp.init(jax.random.PRNGKey(0), x1)["params"]
    # overwrite zero-init router with a real one so routing is nontrivial
    params = dict(params,
                  router=jnp.asarray(rng.standard_normal((64, 4)) * 0.3,
                                     jnp.float32))
    out_gather = mlp.apply({"params": params}, x1)  # t*k = 2 <= E = 4
    x8 = jnp.tile(x1, (1, 8, 1))                    # t*k = 16 > E → dense
    out_dense = mlp.apply({"params": params}, x8)
    np.testing.assert_allclose(np.asarray(out_gather[0, 0]),
                               np.asarray(out_dense[0, 0]),
                               atol=1e-5, rtol=1e-5)


def test_moe_gather_matmul_matches_oracle():
    """Kernel path (interpret mode on CPU): per-slot expert-gathered
    matmul vs a numpy per-slot oracle, int8 and f32 experts."""
    from ragmeup_tpu.ops.moe_matmul import moe_gather_matmul
    rng = np.random.default_rng(0)
    e, k, n, s = 4, 1024, 512, 3
    ids = jnp.asarray([2, 0, 2], jnp.int32)
    x = rng.standard_normal((s, k)).astype(np.float32)
    w8 = rng.integers(-127, 128, (e, k, n), dtype=np.int8)
    sc = (rng.random((e, n)).astype(np.float32) + 0.1) * 0.01
    out = moe_gather_matmul(jnp.asarray(x), jnp.asarray(w8), ids,
                            jnp.asarray(sc))
    ref = np.stack([x[i] @ (w8[int(ids[i])].astype(np.float32)
                            * sc[int(ids[i])][None, :]) for i in range(s)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=1e-3)
    wf = rng.standard_normal((e, k, n)).astype(np.float32) * 0.02
    out2 = moe_gather_matmul(jnp.asarray(x), jnp.asarray(wf), ids)
    ref2 = np.stack([x[i] @ wf[int(ids[i])] for i in range(s)])
    np.testing.assert_allclose(np.asarray(out2), ref2, rtol=2e-3, atol=1e-3)
    # non-tiling dims take the XLA gather fallback and stay exact
    out3 = moe_gather_matmul(jnp.asarray(x[:, :96]),
                             jnp.asarray(wf[:, :96, :100]), ids)
    ref3 = np.stack([x[i, :96] @ wf[int(ids[i]), :96, :100]
                     for i in range(s)])
    np.testing.assert_allclose(np.asarray(out3), ref3, rtol=1e-5, atol=1e-5)


def test_mixtral_generate_int8_and_int4(tmp_path):
    """load_local_llm drives a real Mixtral save_pretrained layout
    end-to-end (greedy tokens match torch generate); the int8 AND int4
    streaming loaders both load the same layout and generate (int4 MoE
    experts landed in 90500a1; the former rejection is gone)."""
    import json
    d, golden, model = _save_tiny_mixtral(tmp_path)
    with open(f"{d}/generation_config.json", "w") as f:
        json.dump({"eos_token_id": 999}, f)
    from ragmeup_tpu.models.hf_loader import load_local_llm
    llm = load_local_llm(d)
    ours = llm.generate(IDS, max_new_tokens=4, temperature=0.0,
                        repetition_penalty=1.0)
    with torch.no_grad():
        ref = model.generate(torch.tensor([IDS]), max_new_tokens=4,
                             do_sample=False)[0, len(IDS):].tolist()
    assert ours == ref
    llm8 = load_local_llm(d, quantization="int8")
    out8 = llm8.generate(IDS, max_new_tokens=4, temperature=0.0,
                         repetition_penalty=1.0)
    assert len(out8) == 4
    llm4 = load_local_llm(d, quantization="int4")
    out4 = llm4.generate(IDS, max_new_tokens=4, temperature=0.0,
                         repetition_penalty=1.0)
    assert len(out4) == 4


def test_moe_train_step_with_load_balancing_loss():
    """Causal-LM training on a tiny MoE decoder over the mesh: the router
    load-balancing auxiliary loss (Switch eq. 4 / HF
    load_balancing_loss_func) is sown by LlamaMoeMlp, added with
    router_aux_coef, and reported; the loss stays finite and the router
    receives gradient (it would get none without the aux hook's probs
    feeding the combine)."""
    from ragmeup_tpu.models.decoder import LlamaConfig, LlamaModel
    from ragmeup_tpu.parallel.mesh import make_mesh, mesh_shape_for
    from ragmeup_tpu.train.train import make_decoder_train_step
    cfg = LlamaConfig.tiny(num_heads=4, num_kv_heads=2, dtype="float32",
                           num_experts=4, num_experts_per_tok=2)
    model = LlamaModel(cfg)
    mesh = make_mesh(mesh_shape_for(8, model_parallel=2))
    rng = np.random.default_rng(0)
    batch = {"ids": rng.integers(0, cfg.vocab_size, (4, 16)).astype(np.int32),
             "mask": np.ones((4, 16), np.int32)}
    state, step = make_decoder_train_step(model, mesh, example_batch=batch,
                                          learning_rate=1e-3)
    r0 = np.asarray(state.params["layer_0"]["mlp"]["router"])
    aux_hist = []
    for _ in range(3):
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        aux_hist.append(float(metrics["aux_loss"]))
    # Switch aux loss is minimized at 1.0 (uniform routing); top-k of a
    # softmax can only over-concentrate, so it must be >= 1
    assert all(a >= 1.0 - 1e-5 for a in aux_hist), aux_hist
    r1 = np.asarray(state.params["layer_0"]["mlp"]["router"])
    assert not np.allclose(r0, r1), "router got no gradient"


def test_moe_load_balancing_loss_uniform_is_one():
    """Exactly uniform routing scores the theoretical minimum 1.0."""
    from ragmeup_tpu.train.train import moe_load_balancing_loss
    e, t, k = 4, 8, 2
    probs = jnp.full((t, e), 1.0 / e, jnp.float32)
    # assignments spread exactly evenly: each expert gets t*k/e slots
    topi = jnp.asarray([[i % e, (i + 1) % e] for i in range(t)], jnp.int32)
    inter = {"layer_0": {"mlp": {"router_probs": (probs,),
                                 "router_topi": (topi,)}}}
    val = float(moe_load_balancing_loss(inter, e))
    np.testing.assert_allclose(val, 1.0, rtol=1e-6)
    assert float(moe_load_balancing_loss({}, e)) == 0.0


def test_moe_grouped_matmul_matches_oracle():
    """Grouped (megablocks-class) prefill kernel vs a per-row oracle in
    interpret mode: rows sorted by expert, ragged group sizes (incl. an
    empty group and a non-tile-multiple group), int8 + f32 experts."""
    from ragmeup_tpu.ops.moe_matmul import moe_grouped_matmul
    rng = np.random.default_rng(1)
    e, k, n = 4, 1024, 512
    gsz = np.asarray([130, 0, 37, 89], np.int32)   # ragged, one empty
    m = int(gsz.sum())
    ids = np.repeat(np.arange(e), gsz)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w8 = rng.integers(-127, 128, (e, k, n), dtype=np.int8)
    sc = (rng.random((e, n)).astype(np.float32) + 0.1) * 0.01
    out = moe_grouped_matmul(jnp.asarray(x), jnp.asarray(w8),
                             jnp.asarray(gsz), jnp.asarray(sc))
    ref = np.stack([x[i] @ (w8[ids[i]].astype(np.float32)
                            * sc[ids[i]][None, :]) for i in range(m)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=1e-3)
    wf = rng.standard_normal((e, k, n)).astype(np.float32) * 0.02
    out2 = moe_grouped_matmul(jnp.asarray(x), jnp.asarray(wf),
                              jnp.asarray(gsz))
    ref2 = np.stack([x[i] @ wf[ids[i]] for i in range(m)])
    np.testing.assert_allclose(np.asarray(out2), ref2, rtol=2e-3, atol=1e-3)
    # small m falls back to ragged_dot and stays exact
    out3 = moe_grouped_matmul(jnp.asarray(x[:8]), jnp.asarray(wf),
                              jnp.asarray([3, 0, 2, 3], np.int32))
    ids3 = np.repeat(np.arange(e), [3, 0, 2, 3])
    ref3 = np.stack([x[i] @ wf[ids3[i]] for i in range(8)])
    np.testing.assert_allclose(np.asarray(out3), ref3, rtol=1e-5, atol=1e-5)
    # large m exercises the VMEM-bounded chunking (group split mid-chunk)
    gsz4 = np.asarray([700, 1100, 0, 700], np.int32)
    m4 = int(gsz4.sum())
    ids4 = np.repeat(np.arange(e), gsz4)
    x4 = rng.standard_normal((m4, k)).astype(np.float32)
    out4 = moe_grouped_matmul(jnp.asarray(x4), jnp.asarray(wf),
                              jnp.asarray(gsz4))
    ref4 = np.stack([x4[i] @ wf[ids4[i]] for i in range(m4)])
    np.testing.assert_allclose(np.asarray(out4), ref4, rtol=2e-3, atol=1e-3)


def test_moe_grouped_matmul_gradients():
    """The kernel path's custom VJP must agree with the differentiable
    ragged_dot fallback for both operands (float experts — the training
    path)."""
    from ragmeup_tpu.ops.moe_matmul import (_grouped_fallback,
                                            moe_grouped_matmul)
    rng = np.random.default_rng(2)
    e, k, n = 4, 1024, 512
    gsz = jnp.asarray([70, 30, 0, 28], jnp.int32)
    m = 128
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((e, k, n)) * 0.05, jnp.float32)

    def loss_k(x, w):
        return jnp.sum(moe_grouped_matmul(x, w, gsz) ** 2)

    def loss_r(x, w):
        return jnp.sum(_grouped_fallback(x, w, gsz, None) ** 2)

    gkx, gkw = jax.grad(loss_k, argnums=(0, 1))(x, w)
    grx, grw = jax.grad(loss_r, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gkx), np.asarray(grx),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gkw), np.asarray(grw),
                               rtol=1e-3, atol=1e-3)


def test_moe_through_serving_engine():
    """A sparse-MoE decoder through the paged-KV continuous-batching
    engine: wave decode of concurrent requests must match each request's
    solo LocalLLM.generate (the per-step token count crosses the
    gather/dense path switch at t*top_k vs E)."""
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer
    from ragmeup_tpu.pipeline.serving import ServingEngine
    cfg = LlamaConfig.tiny(dtype="float32", num_experts=4,
                           num_experts_per_tok=2)
    llm = LocalLLM(cfg, SimpleTokenizer(cfg.vocab_size), seed=0)
    prompts = {"a": [5, 17, 101], "b": [9, 8, 7, 6, 5], "c": [200, 300]}
    want = {k: llm.generate(v, max_new_tokens=5, temperature=0.0,
                            repetition_penalty=1.0, speculative="off")
            for k, v in prompts.items()}
    eng = ServingEngine(llm, num_pages=64, page_size=16,
                        max_pages_per_seq=8)
    for k, v in prompts.items():
        eng.add_request(k, v, max_new_tokens=5, temperature=0.0,
                        repetition_penalty=1.0)
    assert eng.run_wave(steps_per_dispatch=2) == want


def test_moe_tp_ep_generation_matches_single_device():
    """A mesh LocalLLM on an MoE config: attention TP (kv heads over
    'model') and EP (the 'expert' logical axis over 'model' via the
    flax partitioning rules) together, through the full fused
    generation loop — tokens identical to the single-device LLM."""
    from flax import linen as fnn
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer
    from ragmeup_tpu.parallel.mesh import make_mesh, mesh_shape_for
    cfg = LlamaConfig.tiny(num_heads=4, num_kv_heads=2, dtype="float32",
                           num_experts=4, num_experts_per_tok=2)
    tok = SimpleTokenizer(cfg.vocab_size)
    solo = LocalLLM(cfg, tok, seed=11)
    params = fnn.meta.unbox(solo.params)
    mesh = make_mesh(mesh_shape_for(8, model_parallel=2))
    tp = LocalLLM(cfg, tok, params=params, mesh=mesh)
    spec = tp.params["layer_0"]["mlp"]["gate"].sharding.spec
    assert "model" in str(spec), f"experts not EP-sharded: {spec}"
    prompt = [3, 9, 4, 17, 2]
    want = solo.generate(prompt, max_new_tokens=6, temperature=0.0,
                         speculative="off")
    got = tp.generate(prompt, max_new_tokens=6, temperature=0.0,
                      speculative="off")
    assert want == got, (want, got)


def test_moe_expert_parallel_matches_single_device(tmp_path):
    """EP: stacked expert tensors sharded over the 'model' mesh axis
    (4 virtual CPU devices, one expert each) — logits identical to the
    unsharded forward; the combine contraction is the EP collective."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ragmeup_tpu.models.decoder import LlamaModel, causal_bias
    from ragmeup_tpu.parallel.mesh import make_mesh
    d, golden, _ = _save_tiny_mixtral(tmp_path)
    cfg = llama_config_from_hf(d)
    cfg = dataclasses.replace(cfg, dtype="float32")
    tensors = load_safetensors(d)
    params = llama_params_from_hf(tensors, cfg.num_layers,
                                  cfg.tie_embeddings)
    model = LlamaModel(cfg)
    ids = jnp.asarray([IDS], jnp.int32)
    bias = causal_bias(len(IDS), len(IDS))
    pos = jnp.arange(len(IDS))

    def fwd(p):
        return model.apply({"params": p}, ids, positions=pos,
                           attn_bias=bias)["logits"]

    single = np.asarray(fwd(params))
    mesh = make_mesh((1, 1, 4), devices=jax.devices()[:4])
    ep = NamedSharding(mesh, P("model"))
    sharded = jax.tree_util.tree_map(lambda x: x, params)
    for i in range(cfg.num_layers):
        mlp = dict(sharded[f"layer_{i}"]["mlp"])
        for nm in ("gate", "up", "down"):
            mlp[nm] = jax.device_put(jnp.asarray(mlp[nm]), ep)
        sharded[f"layer_{i}"]["mlp"] = mlp
    with mesh:
        out = np.asarray(jax.jit(fwd)(sharded))
    np.testing.assert_allclose(out, single, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out[0], golden, atol=3e-4, rtol=3e-4)


def test_moe_ep_decode_gather_matches_single_device(monkeypatch):
    """EP decode under a mesh takes the shard_map per-device GATHER path
    (LlamaMoeMlp._ep_decode_gather) when S = t*top_k <= E/D: each device
    rebases the routed ids into its local expert range, gathers only its
    own experts' weights, and the partials psum over 'model'. Greedy
    generation must be identical to the single-device LLM, and the path
    must actually engage (counted at trace time), for float AND int8
    stacked experts."""
    import ragmeup_tpu.ops.moe_matmul as mm
    from flax import linen as fnn
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.hf_loader import quantize_decoder_params
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer
    from ragmeup_tpu.parallel.mesh import make_mesh, mesh_shape_for

    cfg = LlamaConfig.tiny(num_heads=4, num_kv_heads=4, dtype="float32",
                           num_experts=16, num_experts_per_tok=2)
    tok = SimpleTokenizer(cfg.vocab_size)
    solo = LocalLLM(cfg, tok, seed=5)
    params = fnn.meta.unbox(solo.params)
    prompt = [3, 9, 4, 17, 2]
    want = solo.generate(prompt, max_new_tokens=6, temperature=0.0,
                         speculative="off")

    calls = []
    orig = mm.moe_gather_matmul
    monkeypatch.setattr(mm, "moe_gather_matmul",
                        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
    mesh = make_mesh(mesh_shape_for(8, model_parallel=4))
    ep = LocalLLM(cfg, tok, params=params, mesh=mesh)
    got = ep.generate(prompt, max_new_tokens=6, temperature=0.0,
                      speculative="off")
    assert got == want, (got, want)
    assert calls, "EP decode gather path did not engage under the mesh"

    # int8 stacked experts through the same path (per-expert scales
    # shard with their expert dim; ids/masking identical)
    qcfg = dataclasses.replace(cfg, quantization="int8")
    qparams = quantize_decoder_params(params, bits=8,
                                      embeddings_bf16=False)
    q_solo = LocalLLM(qcfg, tok, params=qparams)
    q_want = q_solo.generate(prompt, max_new_tokens=6, temperature=0.0,
                             speculative="off")
    calls.clear()
    q_ep = LocalLLM(qcfg, tok, params=qparams, mesh=mesh)
    q_got = q_ep.generate(prompt, max_new_tokens=6, temperature=0.0,
                          speculative="off")
    assert q_got == q_want, (q_got, q_want)
    assert calls, "int8 EP decode gather path did not engage"


def test_moe_int4_experts(tmp_path):
    """int4 stacked experts (packed two-per-byte + per-expert group-wise
    scales — the MoE memory knob, ~half int8's expert bytes). (a) The
    int4 model's full forward must match a FLOAT model built from the
    dequantized experts (the compute path is dequant-then-dot by
    construction, so this is exact up to dot-order noise); (b) greedy
    decode (per-slot packed gather + dequant, t*top_k <= E) matches the
    same float model; (c) the streaming on-device int4 loader agrees
    with the host quantizer (same scales, codes within the +-1 XLA
    rounding tail); (d) load_local_llm no longer rejects int4 + MoE."""
    import jax.numpy as jnp
    from ragmeup_tpu.models.decoder import (LlamaModel, LocalLLM,
                                            causal_bias)
    from ragmeup_tpu.models.hf_loader import llama_int4_params_from_hf
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer
    from ragmeup_tpu.ops.quant_matmul import int4_tiling, unpack_int4

    d, golden, _ = _save_tiny_mixtral(tmp_path)
    cfg = llama_config_from_hf(d)
    cfg = dataclasses.replace(cfg, dtype="float32")
    tensors = load_safetensors(d)
    params_f = llama_params_from_hf(tensors, cfg.num_layers,
                                    cfg.tie_embeddings)
    qfull = quantize_decoder_params(params_f, bits=4,
                                    embeddings_bf16=False)
    cfg4 = dataclasses.replace(cfg, quantization="int4")
    ids = jnp.asarray([IDS], jnp.int32)
    pos = jnp.arange(len(IDS))
    bias = causal_bias(len(IDS), len(IDS))
    model4 = LlamaModel(cfg4)
    out4 = np.asarray(model4.apply({"params": qfull}, ids, positions=pos,
                                   attn_bias=bias)["logits"][0])
    # int4 keeps the torch golden ranking (same bar as the int8 test)
    assert np.corrcoef(golden[-1], out4[-1])[0, 1] > 0.98
    tok = SimpleTokenizer(cfg.vocab_size)
    llm4 = LocalLLM(cfg4, tok, params=qfull)
    gen4 = llm4.generate(IDS[:6], max_new_tokens=6, temperature=0.0,
                         speculative="off")
    assert len(gen4) == 6
    # decode gather-dequant vs the einsum path on IDENTICAL int4 weights:
    # one token (t*top_k=2 <= E=4 → per-slot packed gather + dequant) must
    # equal the same token tiled into a prefill-shaped batch (einsum path)
    from ragmeup_tpu.models.decoder import LlamaMoeMlp
    mlp4 = LlamaMoeMlp(cfg4)
    p0 = qfull["layer_0"]["mlp"]
    rng = np.random.default_rng(7)
    x1 = jnp.asarray(rng.standard_normal((1, 1, cfg.hidden_size)),
                     jnp.float32)
    out_g = mlp4.apply({"params": p0}, x1)
    out_d = mlp4.apply({"params": p0}, jnp.tile(x1, (1, 8, 1)))
    np.testing.assert_allclose(np.asarray(out_g[0, 0]),
                               np.asarray(out_d[0, 0]),
                               atol=1e-5, rtol=1e-5)

    # (c) streaming loader vs host quantizer
    direct = llama_int4_params_from_hf(tensors, cfg.num_layers,
                                       cfg.tie_embeddings)
    hm = quantize_decoder_params(params_f, bits=4)["layer_0"]["mlp"]
    dm = direct["layer_0"]["mlp"]
    tile_k, _ = int4_tiling(cfg.hidden_size)
    np.testing.assert_allclose(np.asarray(dm["gate_gs"]),
                               np.asarray(hm["gate_gs"]), atol=1e-6)
    ug = np.asarray(unpack_int4(jnp.asarray(hm["gate_p"][0]), tile_k),
                    np.int16)
    ud = np.asarray(unpack_int4(jnp.asarray(dm["gate_p"][0]), tile_k),
                    np.int16)
    diff = np.abs(ug - ud)
    assert diff.max() <= 1 and (diff > 0).mean() < 0.01

    # (d) the product loader accepts int4 + MoE end-to-end
    import json
    from ragmeup_tpu.models.hf_loader import load_local_llm
    with open(f"{d}/generation_config.json", "w") as fh:
        json.dump({"eos_token_id": 999}, fh)
    llm = load_local_llm(str(d), quantization="int4")
    out = llm.generate(IDS, max_new_tokens=4, temperature=0.0,
                       repetition_penalty=1.0)
    assert len(out) == 4


def test_moe_gather_int4_kernel_parity():
    """Packed-int4 gather kernel (interpret mode, tiling shapes) must
    match the XLA take+unpack+dequant fallback exactly — the kernel is
    the decode path that streams only the routed slots' packed bytes."""
    from ragmeup_tpu.ops.moe_matmul import (_moe_matmul4_call,
                                            moe_gather_matmul_int4)
    from ragmeup_tpu.ops.quant_matmul import pack_int4

    rng = np.random.default_rng(3)
    E, k, n = 4, 1024, 512
    tile_k, group = 512, 128
    q = rng.integers(-8, 8, (E, k, n)).astype(np.int8)
    gs = (0.01 + rng.random((E, k // group, n)).astype(np.float32))
    wp = np.stack([pack_int4(q[e], tile_k) for e in range(E)])
    x = rng.standard_normal((4, k)).astype(np.float32)
    ids = jnp.asarray([2, 0, 2, 3], jnp.int32)
    got = np.asarray(_moe_matmul4_call(
        jnp.asarray(x), jnp.asarray(wp), jnp.asarray(gs), ids,
        tile_k, 256, group, True, jnp.float32))
    # fallback reference (forced by the s_slots>64 gate never mattering:
    # call the public API on a non-tiling tile_n to route to XLA)
    want = np.asarray(moe_gather_matmul_int4(
        jnp.asarray(x), jnp.asarray(wp), jnp.asarray(gs), ids,
        tile_k, group, tile_n=0, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # group == tile_k fast path (output-scaled)
    gs1 = (0.01 + rng.random((E, k // tile_k, n)).astype(np.float32))
    got1 = np.asarray(_moe_matmul4_call(
        jnp.asarray(x), jnp.asarray(wp), jnp.asarray(gs1), ids,
        tile_k, 256, tile_k, True, jnp.float32))
    want1 = np.asarray(moe_gather_matmul_int4(
        jnp.asarray(x), jnp.asarray(wp), jnp.asarray(gs1), ids,
        tile_k, tile_k, tile_n=0, interpret=True))
    np.testing.assert_allclose(got1, want1, rtol=2e-4, atol=2e-4)


def test_moe_dedup_decode_matches_einsum():
    """Batched decode past the per-slot gate (t*top_k > E) routes through
    the DEDUP grouped gather (moe_grouped='auto') — outputs must equal
    the all-experts einsum ('off') exactly."""
    from ragmeup_tpu.models.decoder import LlamaConfig, LlamaMoeMlp

    cfg = LlamaConfig.tiny(dtype="float32", num_experts=4,
                           num_experts_per_tok=2)
    assert cfg.moe_grouped == "auto"
    mlp = LlamaMoeMlp(cfg)
    rng = np.random.default_rng(9)
    # t=4 tokens, top_k=2 → S=8 > E=4, S <= 4E → dedup engages
    x = jnp.asarray(rng.standard_normal((4, 1, cfg.hidden_size)),
                    jnp.float32)
    params = mlp.init(jax.random.PRNGKey(0), x)["params"]
    out_dedup = mlp.apply({"params": params}, x)
    cfg_off = dataclasses.replace(cfg, moe_grouped="off")
    out_einsum = LlamaMoeMlp(cfg_off).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_dedup),
                               np.asarray(out_einsum),
                               atol=1e-5, rtol=1e-5)


def test_moe_int4_expert_parallel_matches_single_device():
    """int4 MoE under a mesh (ADVICE round-3): EP decode takes the
    shard_map packed-int4 gather (engagement counted), and generation
    matches the single-device int4 LLM exactly; the prefill einsum path
    (dequant stacks sharded on the expert axis) matches too."""
    import ragmeup_tpu.ops.moe_matmul as mm
    from flax import linen as fnn
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.hf_loader import quantize_decoder_params
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer
    from ragmeup_tpu.parallel.mesh import make_mesh, mesh_shape_for

    cfg = LlamaConfig.tiny(num_heads=4, num_kv_heads=4, dtype="float32",
                           num_experts=16, num_experts_per_tok=2)
    tok = SimpleTokenizer(cfg.vocab_size)
    base = LocalLLM(cfg, tok, seed=5)
    params_f = fnn.meta.unbox(base.params)
    qparams = quantize_decoder_params(params_f, bits=4,
                                      embeddings_bf16=False)
    cfg4 = dataclasses.replace(cfg, quantization="int4")
    solo = LocalLLM(cfg4, tok, params=qparams)
    prompt = [3, 9, 4, 17, 2]
    want = solo.generate(prompt, max_new_tokens=6, temperature=0.0,
                         speculative="off")
    want_logits = solo.forward_logits(prompt)

    calls = []
    orig = mm.moe_gather_matmul_int4
    real_calls = mm.moe_gather_matmul_int4

    def spy(*a, **k):
        calls.append(1)
        return real_calls(*a, **k)

    mm.moe_gather_matmul_int4 = spy
    try:
        mesh = make_mesh(mesh_shape_for(8, model_parallel=4))
        ep = LocalLLM(cfg4, tok, params=qparams, mesh=mesh)
        got_logits = ep.forward_logits(prompt)
        got = ep.generate(prompt, max_new_tokens=6, temperature=0.0,
                          speculative="off")
    finally:
        mm.moe_gather_matmul_int4 = orig
    np.testing.assert_allclose(got_logits, want_logits,
                               atol=2e-4, rtol=2e-4)
    assert got == want, (got, want)
    assert calls, "mesh int4 EP decode gather did not engage"


def test_moe_grouped_int4_kernel_parity():
    """Dedup-grouped packed-int4 kernel (interpret mode): rows sorted by
    expert with zero-size groups must match a dequant-stacks per-row
    reference exactly — this is the batched int4 decode path that reads
    each UNIQUE routed expert's packed bytes once."""
    from ragmeup_tpu.ops.moe_matmul import (grouped_int4_viable,
                                            moe_grouped_matmul_int4)
    from ragmeup_tpu.ops.quant_matmul import pack_int4

    rng = np.random.default_rng(7)
    E, k, n = 4, 1024, 512
    pack_tile, group = 512, 128
    q = rng.integers(-8, 8, (E, k, n)).astype(np.int8)
    gs = (0.01 + rng.random((E, k // group, n))).astype(np.float32)
    wp = np.stack([pack_int4(q[e], pack_tile) for e in range(E)])
    m = 10
    gsz = np.array([3, 0, 5, 2], np.int32)
    xs = rng.standard_normal((m, k)).astype(np.float32)
    assert grouped_int4_viable(m, E, k, n, pack_tile, group, jnp.float32)
    got = np.asarray(moe_grouped_matmul_int4(
        jnp.asarray(xs), jnp.asarray(wp), jnp.asarray(gs),
        jnp.asarray(gsz), pack_tile, group, interpret=True))
    wd = q.astype(np.float32) * np.repeat(gs, group, axis=1)
    eid = np.repeat(np.arange(E), gsz)
    want = np.stack([xs[i] @ wd[eid[i]] for i in range(m)])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # group == pack_tile (output-scaled fast path inside the kernel)
    gs1 = (0.01 + rng.random((E, k // pack_tile, n))).astype(np.float32)
    got1 = np.asarray(moe_grouped_matmul_int4(
        jnp.asarray(xs), jnp.asarray(wp), jnp.asarray(gs1),
        jnp.asarray(gsz), pack_tile, pack_tile, interpret=True))
    wd1 = q.astype(np.float32) * np.repeat(gs1, pack_tile, axis=1)
    want1 = np.stack([xs[i] @ wd1[eid[i]] for i in range(m)])
    np.testing.assert_allclose(got1, want1, rtol=2e-4, atol=2e-4)


def test_moe_int4_dedup_decode_matches_einsum():
    """Batched int4 decode past the per-slot gate (E < t*top_k <= 4E,
    moe_grouped='auto') routes through the dedup-grouped packed kernel —
    outputs must equal the all-experts dequant einsum ('off') exactly.
    Shapes are chosen so grouped_int4_viable holds (h=512, f=256)."""
    from ragmeup_tpu.models.decoder import LlamaConfig, LlamaMoeMlp

    cfg = LlamaConfig.tiny(dtype="float32", quantization="int4",
                           hidden_size=512, intermediate_size=256,
                           num_heads=4, num_kv_heads=2,
                           num_experts=4, num_experts_per_tok=2)
    assert cfg.moe_grouped == "auto"
    mlp = LlamaMoeMlp(cfg)
    rng = np.random.default_rng(11)
    # t=4 tokens, top_k=2 -> S=8 > E=4, S <= 4E -> int4 dedup engages
    x = jnp.asarray(rng.standard_normal((4, 1, cfg.hidden_size)),
                    jnp.float32)
    from flax.core import meta
    zero = meta.unbox(mlp.init(jax.random.PRNGKey(0), x)["params"])

    def randomize(path, leaf):
        name = "/".join(str(p) for p in path)
        if leaf.dtype == jnp.int8:
            return jnp.asarray(rng.integers(-127, 128, leaf.shape),
                               jnp.int8)
        if "gs" in name:
            return jnp.asarray(0.01 + 0.1 * rng.random(leaf.shape),
                               jnp.float32)
        return jnp.asarray(rng.standard_normal(leaf.shape), leaf.dtype)

    params = jax.tree_util.tree_map_with_path(
        lambda p, v: randomize([getattr(k, "key", k) for k in p], v), zero)
    out_dedup = mlp.apply({"params": params}, x)
    cfg_off = dataclasses.replace(cfg, moe_grouped="off")
    out_einsum = LlamaMoeMlp(cfg_off).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_dedup),
                               np.asarray(out_einsum),
                               atol=2e-4, rtol=2e-4)
