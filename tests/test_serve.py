"""Serving layer tests: AOT compile, StableHLO export, scoring service."""

import numpy as np

import jax
import jax.numpy as jnp

from occm_tpu.config import AASISTConfig, XLSRConfig
from occm_tpu.models import AModel
from occm_tpu.serve import (
    ScoringService,
    aot_compile,
    export_stablehlo,
    make_score_fn,
)

CUT = 3200


def _model_and_fn():
    model = AModel(AASISTConfig(), xlsr_cfg=XLSRConfig.tiny())
    init_fn = jax.jit(
        lambda r, x: model.init({"params": r, "dropout": r}, x)
    )
    variables = init_fn(jax.random.PRNGKey(0), jnp.zeros((2, CUT)))
    return make_score_fn(
        model, variables["params"], variables.get("batch_stats", {})
    )


def test_aot_compile_and_run():
    fn = _model_and_fn()
    exe = aot_compile(fn, batch=2, length=CUT)
    emb, logits = exe(jnp.zeros((2, CUT), jnp.float32))
    assert emb.shape == (2, 160)
    assert logits.shape == (2, 2)


def test_export_stablehlo(tmp_path):
    fn = _model_and_fn()
    p = tmp_path / "model.stablehlo"
    text = export_stablehlo(fn, batch=1, length=CUT, path=str(p))
    assert "module" in text
    assert p.exists() and p.stat().st_size > 1000


def test_scoring_service_end_to_end():
    fn = _model_and_fn()
    rng = np.random.default_rng(0)
    ref = rng.normal(size=160).astype(np.float32)
    svc = ScoringService(fn, ref, threshold=5.0, buckets=(CUT,), batch=2)
    waves = [
        rng.normal(size=2000).astype(np.float32) * 0.1,
        rng.normal(size=3200).astype(np.float32) * 0.1,
        rng.normal(size=1000).astype(np.float32) * 0.1,
    ]
    scores, preds = svc.score(waves)
    assert scores.shape == (3,)
    assert set(preds) <= {0, 1}
    assert np.all(np.isfinite(scores))
    # deterministic
    scores2, _ = svc.score(waves)
    np.testing.assert_array_equal(scores, scores2)


def test_batching_queue_matches_direct_and_batches():
    """Concurrent submits produce the same scores as direct service calls,
    and the dynamic batcher actually groups them into batched device
    calls (call count < request count)."""
    from occm_tpu.serve import BatchingQueue

    fn = _model_and_fn()
    rng = np.random.default_rng(1)
    ref = rng.normal(size=160).astype(np.float32)
    svc = ScoringService(fn, ref, threshold=5.0, buckets=(CUT,), batch=4)
    svc.warmup()
    waves = [rng.normal(size=CUT).astype(np.float32) * 0.1
             for _ in range(8)]
    direct_scores, direct_preds = svc.score(waves)

    calls = []
    orig = svc.score

    def counting_score(ws):
        calls.append(len(ws))
        return orig(ws)

    svc.score = counting_score
    try:
        with BatchingQueue(svc, max_wait_ms=200.0) as q:
            futs = [q.submit(w) for w in waves]
            results = [f.result(timeout=60) for f in futs]
    finally:
        svc.score = orig

    for i, (s, p) in enumerate(results):
        assert s == float(direct_scores[i])
        assert p == int(direct_preds[i])
    assert sum(calls) == 8
    assert len(calls) < 8, f"no batching happened: {calls}"


def test_batching_queue_close_rejects_new_submits():
    from occm_tpu.serve import BatchingQueue

    fn = _model_and_fn()
    ref = np.zeros(160, np.float32)
    svc = ScoringService(fn, ref, threshold=5.0, buckets=(CUT,), batch=2)
    q = BatchingQueue(svc, max_wait_ms=1.0)
    q.close()
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        q.submit(np.zeros(100, np.float32))


def test_batching_queue_propagates_service_errors():
    """A failing device call must reject the waiting futures, not hang
    the queue, and later requests still work."""
    from occm_tpu.serve import BatchingQueue

    class FlakyService:
        batch = 4

        def __init__(self):
            self.calls = 0

        def score(self, waves):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("boom")
            return np.arange(len(waves), dtype=np.float64), \
                np.zeros(len(waves), np.int32)

    svc = FlakyService()
    with BatchingQueue(svc, max_wait_ms=50.0) as q:
        f1 = q.submit(np.zeros(10, np.float32))
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="boom"):
            f1.result(timeout=30)
        s, p = q.score_sync(np.zeros(10, np.float32), timeout=30)
        assert (s, p) == (0.0, 0)
