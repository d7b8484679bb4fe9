"""open_url / is_url offline semantics (reference dnnlib/util.py:390-497).

No network is available in this environment, so the http(s) paths are
exercised through the md5 cache and the GANTRACK_URL_MIRROR escape hatch
— exactly the air-gapped deployment story the shim exists for.
"""

import hashlib
import os

import pytest

from gantrack_tpu.utils.url import is_url, open_url


def test_is_url():
    assert is_url("https://example.com/x.pkl")
    assert is_url("http://nvlabs-fi-cdn.nvidia.com/stylegan2-ada/x.pkl")
    assert not is_url("/local/path.pkl")
    assert not is_url("file:///local/path.pkl")
    assert is_url("file:///local/path.pkl", allow_file_urls=True)
    assert not is_url(42)
    assert not is_url("https://nodots/x")


def test_local_path_passthrough(tmp_path):
    p = tmp_path / "weights.bin"
    p.write_bytes(b"abc")
    assert open_url(str(p), return_filename=True) == str(p)
    with open_url(str(p)) as f:
        assert f.read() == b"abc"


def test_file_url(tmp_path):
    p = tmp_path / "w.bin"
    p.write_bytes(b"xyz")
    with open_url(f"file://{p}") as f:
        assert f.read() == b"xyz"
    assert open_url(f"file://{p}", return_filename=True) == str(p)


def test_cache_hit_without_network(tmp_path):
    url = "https://example.com/detector/inception-2015-12-05.pkl"
    md5 = hashlib.md5(url.encode()).hexdigest()
    cache = tmp_path / "cache"
    cache.mkdir()
    seeded = cache / f"{md5}_inception-2015-12-05.pkl"
    seeded.write_bytes(b"seeded-weights")
    # Pre-seeded cache must serve the URL with zero network traffic.
    with open_url(url, cache_dir=str(cache), num_attempts=1, verbose=False) as f:
        assert f.read() == b"seeded-weights"
    assert open_url(url, cache_dir=str(cache), return_filename=True) == str(seeded)


def test_mirror_lookup(tmp_path, monkeypatch):
    url = "https://example.com/models/vgg16.pt?dl=1"
    mirror = tmp_path / "mirror"
    mirror.mkdir()
    (mirror / "vgg16.pt").write_bytes(b"mirrored")
    monkeypatch.setenv("GANTRACK_URL_MIRROR", str(mirror))
    cache = tmp_path / "cache"
    with open_url(url, cache_dir=str(cache), num_attempts=1, verbose=False) as f:
        assert f.read() == b"mirrored"
    # The mirror hit is copied into the cache (atomic), so the second
    # call works even if the mirror disappears.
    monkeypatch.delenv("GANTRACK_URL_MIRROR")
    with open_url(url, cache_dir=str(cache), num_attempts=1, verbose=False) as f:
        assert f.read() == b"mirrored"


def test_unreachable_raises_descriptive(tmp_path, monkeypatch):
    # Point urllib at an unroutable address; error must name the escape
    # hatches (cache dir + mirror var).
    import urllib.request

    def boom(*a, **k):
        raise OSError("network unreachable")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    with pytest.raises(IOError, match="GANTRACK_URL_MIRROR"):
        open_url("https://example.com/x.pkl", cache_dir=str(tmp_path / "c"),
                 num_attempts=2, verbose=False)
