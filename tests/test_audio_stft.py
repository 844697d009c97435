import numpy as np
import pyarrow as pa

from open_telemetry_opentelemetry_collector_contrib_ray.stages.multimodal import (
    AudioSpectralExtractor,
    encode_wav,
)


def _tone(freq, sr=16000, secs=1.0, amp=0.5):
    t = np.arange(int(sr * secs)) / sr
    return (np.clip(amp * np.sin(2 * np.pi * freq * t), -1, 1)
            * 32767).astype("<i2").tobytes()


def test_stft_recovers_tone_pcm_and_wav():
    sr = 16000
    pcm = _tone(437.5, sr)  # 437.5 Hz = exactly bin 28 at n_fft=1024
    batch = pa.table({
        "item_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([pcm, encode_wav(pcm, sr)], pa.large_binary()),
        "sample_rate": pa.array([sr, sr], pa.int32()),
        "mime": pa.array(["audio/pcm16", "audio/wav"]),
    })
    out = AudioSpectralExtractor(n_fft=1024)(batch).to_pandas()
    # exact on-bin tone: both container paths give the identical bin
    assert np.allclose(out["dominant_freq_hz"], 437.5)
    assert (out["parseval_rel_err"] < 1e-9).all()
    # centroid of a pure tone sits near the tone (leakage skews slightly)
    assert (np.abs(out["spectral_centroid_hz"] - 437.5) < 40).all()


def test_stft_off_bin_tone_within_one_bin():
    sr, nfft = 16000, 1024
    out = AudioSpectralExtractor(n_fft=nfft)(pa.table({
        "item_id": pa.array([0], pa.int64()),
        "payload": pa.array([_tone(100.0, sr)], pa.large_binary()),
        "sample_rate": pa.array([sr], pa.int32()),
        "mime": pa.array(["audio/pcm16"]),
    })).to_pandas()
    assert abs(out["dominant_freq_hz"][0] - 100.0) <= sr / nfft


def test_stft_short_payload_is_nan_not_crash():
    out = AudioSpectralExtractor(n_fft=1024)(pa.table({
        "item_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([b"", b"\x01\x02" * 10], pa.large_binary()),
        "sample_rate": pa.array([16000, 16000], pa.int32()),
        "mime": pa.array(["audio/pcm16", "audio/pcm16"]),
    })).to_pandas()
    assert out["dominant_freq_hz"].isna().all()
