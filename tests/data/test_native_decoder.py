"""Native libav decoder tests against a hand-written YUV4MPEG2 video with known
per-frame luma values (no ffmpeg binary needed)."""

import numpy as np
import pytest

from eilev_tpu.native import VideoDecoder, decoder_available

pytestmark = pytest.mark.skipif(not decoder_available(), reason="native decoder unavailable")

W, H, FPS, NFRAMES = 32, 16, 10, 50


def _write_y4m(path, nframes=NFRAMES, w=W, h=H, fps=FPS):
    """Grayscale video where frame i has luma = 16 + 4*i (BT.601 limited range)."""
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode())
        for i in range(nframes):
            f.write(b"FRAME\n")
            y = np.full((h, w), min(16 + 4 * i, 235), np.uint8)
            u = np.full((h // 2, w // 2), 128, np.uint8)
            v = np.full((h // 2, w // 2), 128, np.uint8)
            f.write(y.tobytes() + u.tobytes() + v.tobytes())


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("vid") / "test.y4m"
    _write_y4m(str(p))
    return str(p)


def test_metadata(video_path):
    with VideoDecoder(video_path) as dec:
        assert dec.size == (H, W)
        assert abs(dec.fps - FPS) < 0.01
        assert abs(dec.duration - NFRAMES / FPS) < 0.2


def test_decode_clip_uniform_sampling(video_path):
    with VideoDecoder(video_path) as dec:
        # 2-second window starting at t=1s -> frames 10..29; 4 uniform samples at
        # t = 1 + 2*(i+0.5)/4 -> frames {12, 17, 22, 27}
        clip = dec.decode_clip(1.0, 3.0, 4)
        assert clip.shape == (3, 4, H, W)
        assert clip.dtype == np.uint8
        # gray video: luma of frame i is 16+4i; swscale converts limited-range
        # Y to RGB as R ~= (Y-16)*255/219, so recover i = R * 219 / (4*255)
        reds = clip[0, :, 0, 0].astype(np.float64)
        recovered = reds * 219.0 / (4 * 255.0)
        np.testing.assert_allclose(recovered, [12, 17, 22, 27], atol=1.2)
        assert (np.diff(reds) > 0).all()


def test_decode_with_resize(video_path):
    with VideoDecoder(video_path) as dec:
        clip = dec.decode_clip(0.0, 1.0, 2, height=8, width=12)
        assert clip.shape == (3, 2, 8, 12)


def test_decode_window_clamped_to_end(video_path):
    with VideoDecoder(video_path) as dec:
        clip = dec.decode_clip(4.0, 6.0, 4)  # video ends at 5s
        assert clip.shape == (3, 4, H, W)
        # later samples fall past the end and get padded with the last frame
        assert clip[0, -1, 0, 0] >= clip[0, 0, 0, 0]


def test_open_missing_file_raises():
    with pytest.raises(RuntimeError):
        VideoDecoder("/nonexistent/video.mp4")


def test_parallel_decodes(video_path):
    """GIL-released decodes from a thread pool (the production data-path shape)."""
    from concurrent.futures import ThreadPoolExecutor

    def work(i):
        with VideoDecoder(video_path) as dec:
            return dec.decode_clip(0.5 * (i % 4), 0.5 * (i % 4) + 1.0, 4).sum()

    with ThreadPoolExecutor(8) as ex:
        sums = list(ex.map(work, range(16)))
    assert all(s > 0 for s in sums)
