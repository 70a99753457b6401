"""Egress-gated dataset download (data/download.py).

The reference auto-fetches the GroupLens archives with a retry loop
(``mxgraph/datasets.py:288-375``).  These tests exercise the TPU
build's equivalent WITHOUT network: ``urllib.request.urlopen`` is
monkeypatched to serve a zip built from the exact-format synthetic
fixtures, so the whole chain — fetch, atomic rename, extract,
``LoadData`` parse — runs offline.
"""

import io
import os
import urllib.request
import zipfile

import numpy as np
import pytest

from stargcn_tpu.data.download import (MOVIELENS_ARCHIVES, ensure_movielens,
                                       fetch, sha1_of)
from stargcn_tpu.data.movielens import LoadData
from stargcn_tpu.data.synthetic import write_ml100k_format


@pytest.fixture(scope="module")
def ml100k_zip_bytes(tmp_path_factory):
    """A real ml-100k.zip: the synthetic exact-format fixture files
    zipped under the archive's 'ml-100k/' prefix."""
    src = tmp_path_factory.mktemp("zipsrc") / "ml-100k"
    write_ml100k_format(str(src), num_users=30, num_items=20,
                        num_edges=600, seed=3)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for fname in sorted(os.listdir(src)):
            zf.write(src / fname, arcname=f"ml-100k/{fname}")
    return buf.getvalue()


def _serve(monkeypatch, payload, fail_first=0):
    """urlopen stub: fail the first ``fail_first`` calls, then serve
    ``payload``.  Returns the call-count list."""
    calls = []

    class _Resp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url, timeout=None):
        calls.append(url)
        if len(calls) <= fail_first:
            raise urllib.error.URLError("synthetic network failure")
        return _Resp(payload)

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    return calls


class TestFetch:
    def test_atomic_write_and_hash(self, tmp_path, monkeypatch):
        payload = b"hello world" * 100
        _serve(monkeypatch, payload)
        dest = tmp_path / "f.bin"
        out = fetch("http://x/f.bin", str(dest),
                    sha1=__import__("hashlib").sha1(payload).hexdigest())
        assert out == str(dest)
        assert dest.read_bytes() == payload
        assert not os.path.exists(str(dest) + ".part")

    def test_retries_then_succeeds(self, tmp_path, monkeypatch):
        payload = b"abc"
        calls = _serve(monkeypatch, payload, fail_first=2)
        dest = tmp_path / "f.bin"
        fetch("http://x/f.bin", str(dest), retries=5, backoff_s=0.0)
        assert len(calls) == 3
        assert dest.read_bytes() == payload

    def test_exhausted_retries_raises_and_leaves_no_file(self, tmp_path,
                                                         monkeypatch):
        calls = _serve(monkeypatch, b"", fail_first=100)
        dest = tmp_path / "f.bin"
        with pytest.raises(urllib.error.URLError):
            fetch("http://x/f.bin", str(dest), retries=3, backoff_s=0.0)
        assert len(calls) == 3
        assert not dest.exists()
        assert not os.path.exists(str(dest) + ".part")

    def test_sha1_mismatch_retries_then_raises(self, tmp_path, monkeypatch):
        calls = _serve(monkeypatch, b"payload")
        dest = tmp_path / "f.bin"
        with pytest.raises(OSError, match="sha1 mismatch"):
            fetch("http://x/f.bin", str(dest), sha1="0" * 40,
                  retries=2, backoff_s=0.0)
        assert len(calls) == 2
        assert not dest.exists()

    def test_existing_good_file_is_kept(self, tmp_path, monkeypatch):
        dest = tmp_path / "f.bin"
        dest.write_bytes(b"cached")
        calls = _serve(monkeypatch, b"fresh")
        fetch("http://x/f.bin", str(dest), sha1=sha1_of(str(dest)))
        assert dest.read_bytes() == b"cached"
        assert not calls


class TestEnsureMovielens:
    def test_download_extract_then_load(self, tmp_path, monkeypatch,
                                        ml100k_zip_bytes):
        calls = _serve(monkeypatch, ml100k_zip_bytes)
        root = str(tmp_path / "data")
        data_dir = ensure_movielens("ml-100k", root, backoff_s=0.0)
        assert os.path.isfile(os.path.join(data_dir, "u1.base"))
        assert calls == [MOVIELENS_ARCHIVES["ml-100k"][1]]
        # second call: directory exists, no network touched
        assert ensure_movielens("ml-100k", root) == data_dir
        assert len(calls) == 1
        # the extracted archive parses end-to-end
        data = LoadData("ml-100k", root=root, seed=5)
        assert data.test_data[0].shape[0] == 2
        assert np.all(np.isin(data.test_data[1], [1, 2, 3, 4, 5]))

    def test_loaddata_autodownloads(self, tmp_path, monkeypatch,
                                    ml100k_zip_bytes):
        _serve(monkeypatch, ml100k_zip_bytes)
        data = LoadData("ml-100k", root=str(tmp_path / "dl"), seed=5)
        assert data.test_data[1].size > 0

    def test_loaddata_offline_error_mentions_archive(self, tmp_path,
                                                     monkeypatch):
        _serve(monkeypatch, b"", fail_first=100)
        monkeypatch.setattr(
            "stargcn_tpu.data.download.fetch",
            lambda *a, **k: (_ for _ in ()).throw(
                urllib.error.URLError("no egress")))
        with pytest.raises(FileNotFoundError, match="files.grouplens.org"):
            LoadData("ml-100k", root=str(tmp_path / "nodata"), seed=5)

    def test_loaddata_optout(self, tmp_path, monkeypatch):
        calls = _serve(monkeypatch, b"")
        monkeypatch.setenv("STARGCN_AUTO_DOWNLOAD", "0")
        with pytest.raises(FileNotFoundError, match="STARGCN_AUTO_DOWNLOAD"):
            LoadData("ml-100k", root=str(tmp_path / "nodata2"), seed=5)
        assert not calls

    def test_bad_archive_layout_raises(self, tmp_path, monkeypatch):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("wrong-dir/u.user", "1|20|M|artist|00000\n")
        _serve(monkeypatch, buf.getvalue())
        with pytest.raises(FileNotFoundError, match="expected"):
            ensure_movielens("ml-100k", str(tmp_path / "bad"), backoff_s=0.0)


class TestGloveAndCLI:
    def test_ensure_glove(self, tmp_path, monkeypatch):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("glove.840B.300d.txt",
                        "movie " + " ".join(["0.1"] * 300) + "\n")
        _serve(monkeypatch, buf.getvalue())
        from stargcn_tpu.data.download import ensure_glove
        path = ensure_glove(str(tmp_path), backoff_s=0.0)
        assert path.endswith("glove.840B.300d.txt")
        from stargcn_tpu.data.movielens import load_glove
        assert load_glove(path)["movie"].shape == (300,)
        # idempotent, no refetch
        assert ensure_glove(str(tmp_path)) == path

    def test_cli_main(self, tmp_path, monkeypatch, ml100k_zip_bytes,
                      capsys):
        _serve(monkeypatch, ml100k_zip_bytes)
        from stargcn_tpu.data.download import _main
        _main(["ml-100k", str(tmp_path)])
        out = capsys.readouterr().out.strip()
        assert out.endswith("ml-100k")
        assert os.path.isfile(os.path.join(out, "u1.base"))
