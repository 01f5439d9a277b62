"""HTTP scoring front-end tests (stdlib client, tiny model, CPU)."""

import io
import json
import threading
import urllib.request
import wave as wave_mod

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occm_tpu.config import AASISTConfig, XLSRConfig
from occm_tpu.models import AModel
from occm_tpu.serve import BatchingQueue, ScoringService, make_score_fn
from occm_tpu.serve_http import ScoringHTTPServer, decode_request_audio

CUT = 3200


def _service():
    model = AModel(AASISTConfig(), xlsr_cfg=XLSRConfig.tiny())
    init_fn = jax.jit(lambda r, x: model.init({"params": r, "dropout": r}, x))
    variables = init_fn(jax.random.PRNGKey(0), jnp.zeros((2, CUT)))
    fn = make_score_fn(
        model, variables["params"], variables.get("batch_stats", {})
    )
    ref = np.random.default_rng(0).normal(size=160).astype(np.float32)
    return ScoringService(fn, ref, threshold=5.0, buckets=(CUT,), batch=2)


def _flac_bytes(wave: np.ndarray, sr: int = 16000) -> bytes:
    from occm_tpu.io.flac import encode_flac_mono16

    pcm = (np.clip(wave, -1, 1) * 32767).astype(np.int64)
    return encode_flac_mono16(pcm, sr)


def _wav_bytes(wave: np.ndarray, sr: int = 16000) -> bytes:
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(
            (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
        )
    return buf.getvalue()


def _post(url: str, body: bytes, headers=None):
    req = urllib.request.Request(url, data=body, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_decode_request_audio_formats():
    rng = np.random.default_rng(1)
    wave = (rng.normal(size=2000) * 0.1).astype(np.float32)

    got = decode_request_audio(_wav_bytes(wave), None)
    assert got.shape == (2000,)
    np.testing.assert_allclose(got, wave, atol=1e-4)

    got = decode_request_audio(_flac_bytes(wave), None)
    np.testing.assert_allclose(got, wave, atol=1e-4)

    got = decode_request_audio(wave.astype("<f4").tobytes(), None)
    np.testing.assert_allclose(got, wave, atol=0)

    # 8 kHz raw PCM resampled to 16 kHz
    got = decode_request_audio(wave.astype("<f4").tobytes(), "8000")
    assert got.shape == (4000,)


def test_http_server_end_to_end():
    svc = _service()
    rng = np.random.default_rng(2)
    with BatchingQueue(svc, max_wait_ms=20.0) as batcher:
        with ScoringHTTPServer(batcher) as server:
            base = f"http://127.0.0.1:{server.port}"

            # health
            with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
                assert json.loads(r.read())["status"] == "ok"

            # WAV + FLAC + raw bodies, concurrently (exercises batching)
            wave = (rng.normal(size=2500) * 0.1).astype(np.float32)
            bodies = [
                _wav_bytes(wave),
                _flac_bytes(wave),
                wave.astype("<f4").tobytes(),
            ]
            results = [None] * len(bodies)

            def worker(i):
                results[i] = _post(base + "/score", bodies[i])

            threads = [
                threading.Thread(target=worker, args=(i,))
                for i in range(len(bodies))
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()

            scores = []
            for code, payload in results:
                assert code == 200
                assert payload["label"] in ("spoof", "bonafide")
                assert payload["prediction"] in (0, 1)
                scores.append(payload["score"])
            # same audio through all three containers -> same score
            # (16-bit containers quantise the waveform slightly)
            assert abs(scores[0] - scores[2]) < 1e-2
            assert abs(scores[1] - scores[2]) < 1e-2

            # error paths
            code, payload = _post(base + "/score", b"\x01\x02\x03")
            assert code == 400 and "undecodable" in payload["error"]
            code, payload = _post(base + "/nope", b"RIFF")
            assert code == 404
            code, payload = _post(base + "/score", b"")
            assert code == 400

            assert server.scored == 3


@pytest.mark.parametrize("extra_flags", [[], ["--quant_int8"]],
                         ids=["fp32", "int8"])
def test_oc_server_cli_end_to_end(tmp_path, monkeypatch, extra_flags):
    """occm-serve CLI: artifacts + tiny model -> live HTTP scoring
    (fp32 and the W8A8 --quant_int8 load-time transform)."""
    rng = np.random.default_rng(3)
    np.save(tmp_path / "reference_embedding.npy",
            rng.normal(size=160).astype(np.float32))
    np.save(tmp_path / "threshold.npy", np.float32(5.0))

    from occm_tpu.cli import oc_server

    started = threading.Event()
    started.stop = threading.Event()
    t = threading.Thread(
        target=oc_server.main,
        args=([
            "--pretrained-sslaasist", str(tmp_path / "missing_ckpt"),
            "--artifacts_dir", str(tmp_path),
            "--host", "127.0.0.1", "--port", "0",
            "--xlsr_tiny", "--allow_random_init",
            "--batch_size", "2", "--buckets", str(CUT), "--no_warmup",
        ] + extra_flags, started),
        daemon=True,
    )
    t.start()
    assert started.wait(timeout=120), "server failed to start"
    try:
        port = started.server.port
        wave = (rng.normal(size=2500) * 0.1).astype(np.float32)
        code, payload = _post(
            f"http://127.0.0.1:{port}/score", _wav_bytes(wave)
        )
        assert code == 200
        assert payload["label"] in ("spoof", "bonafide")
    finally:
        started.stop.set()
        t.join(timeout=30)
    assert not t.is_alive()


def test_oc_server_cli_missing_artifacts(tmp_path):
    """Hard-fail when the classifier artifacts are absent."""
    import pytest

    from occm_tpu.cli import oc_server

    with pytest.raises(SystemExit, match="missing artifact"):
        oc_server.main([
            "--artifacts_dir", str(tmp_path), "--xlsr_tiny",
            "--allow_random_init",
        ])


def test_http_large_body_spooled_streaming(monkeypatch):
    """Bodies above the spool threshold stream to disk in chunks and decode
    through the native C-ABI readers (FLAC via ocm_flac_open/read) — same
    scores as the in-memory path (VERDICT r2 item 8)."""
    import occm_tpu.serve_http as sh

    svc = _service()
    rng = np.random.default_rng(4)
    wave = (rng.normal(size=20000) * 0.1).astype(np.float32)

    with BatchingQueue(svc, max_wait_ms=5.0) as batcher:
        with ScoringHTTPServer(batcher) as server:
            base = f"http://127.0.0.1:{server.port}"
            bodies = {
                "wav": _wav_bytes(wave),
                "flac": _flac_bytes(wave),
                "raw": wave.astype("<f4").tobytes(),
            }
            inmem = {k: _post(base + "/score", b) for k, b in bodies.items()}
            # force every one of these bodies through the spool path
            monkeypatch.setattr(sh, "SPOOL_THRESHOLD_BYTES", 1024)
            monkeypatch.setattr(sh, "_CHUNK", 4096)  # multiple reads/body
            spooled = {k: _post(base + "/score", b)
                       for k, b in bodies.items()}
            for k in bodies:
                assert inmem[k][0] == 200 and spooled[k][0] == 200, (
                    k, inmem[k], spooled[k])
                assert abs(inmem[k][1]["score"]
                           - spooled[k][1]["score"]) < 1e-6, k
            # spooled garbage (not a container, not float32-aligned)
            # still errors cleanly
            code, payload = _post(base + "/score", b"\x07" * 4097)
            assert code == 400


def test_decoded_size_cap(monkeypatch, tmp_path):
    """Oversized decoded audio is rejected in both the in-memory and the
    spooled decode paths (MAX_DECODED_SAMPLES guards serving RAM)."""
    import pytest

    from occm_tpu import serve_http

    monkeypatch.setattr(serve_http, "MAX_DECODED_SAMPLES", 1000)

    # raw PCM, in-memory path: 2000 samples > cap
    body = np.zeros(2000, "<f4").tobytes()
    with pytest.raises(ValueError, match="too long"):
        serve_http.decode_request_audio(body, "16000")
    # under the cap decodes fine
    assert len(serve_http.decode_request_audio(
        np.zeros(500, "<f4").tobytes(), "16000")) == 500

    # spooled raw-PCM path
    p = tmp_path / "big.spool"
    p.write_bytes(np.zeros(2000, "<f4").tobytes())
    with pytest.raises(ValueError, match="too long"):
        serve_http.decode_spooled_audio(str(p), "16000")

    # spooled WAV path (native or python fallback)
    import wave as wave_mod

    wp = tmp_path / "big.wav"
    with wave_mod.open(str(wp), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(2000, "<i2").tobytes())
    with pytest.raises(ValueError, match="too long"):
        serve_http.decode_spooled_audio(str(wp), None)
