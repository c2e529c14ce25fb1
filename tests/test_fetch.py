"""Chisco fetcher against a fake S3 transport (zero-egress environment;
reference behavior: ``main_model/data/dataset.sh`` downloads
``derivatives/preprocessed_pkl/sub-XX/..._task-imagine_..._eeg.pkl``)."""

import json

import pytest

from imagined_speech_translation_tpu.data.fetch import (
    BUCKET,
    fetch_corpus,
    list_subject_files,
)

NS = "http://s3.amazonaws.com/doc/2006-03-01/"


def s3_xml(entries, *, truncated=False, token=None):
    items = "".join(
        f"<Contents><Key>{k}</Key><Size>{s}</Size></Contents>"
        for k, s in entries
    )
    more = (
        f"<IsTruncated>true</IsTruncated>"
        f"<NextContinuationToken>{token}</NextContinuationToken>"
        if truncated
        else "<IsTruncated>false</IsTruncated>"
    )
    return (
        f'<?xml version="1.0"?><ListBucketResult xmlns="{NS}">'
        f"{items}{more}</ListBucketResult>"
    ).encode()


class FakeS3:
    def __init__(self):
        p = "ds005170/derivatives/preprocessed_pkl/sub-01/eeg"
        self.objects = {
            f"{p}/sub-01_task-imagine_run-01_eeg.pkl": b"pkl-one",
            f"{p}/sub-01_task-imagine_run-02_eeg.pkl": b"pkl-two-x",
            f"{p}/sub-01_task-rest_run-01_eeg.pkl": b"ignored",  # filtered
            f"{p}/sub-01_task-imagine_run-01_events.tsv": b"no",  # filtered
        }
        self.page2_key = f"{p}/sub-01_task-imagine_run-03_eeg.pkl"
        self.objects[self.page2_key] = b"pkl-three-yy"
        self.calls = []

    def __call__(self, method, url):
        self.calls.append(url)
        if "list-type=2" in url:
            entries = [
                (k, len(v))
                for k, v in sorted(self.objects.items())
                if k != self.page2_key
            ]
            if "continuation-token" in url:
                return 200, s3_xml([(self.page2_key, len(self.objects[self.page2_key]))])
            return 200, s3_xml(entries, truncated=True, token="tok123")
        key = url.replace(f"{BUCKET}/", "")
        if key in self.objects:
            return 200, self.objects[key]
        return 404, b"missing"


def test_list_filters_and_paginates():
    s3 = FakeS3()
    files = list_subject_files("01", s3)
    names = sorted(f["key"].rsplit("/", 1)[-1] for f in files)
    assert names == [
        "sub-01_task-imagine_run-01_eeg.pkl",
        "sub-01_task-imagine_run-02_eeg.pkl",
        "sub-01_task-imagine_run-03_eeg.pkl",
    ]
    assert any("continuation-token=tok123" in u for u in s3.calls)


def test_fetch_downloads_verifies_and_caches(tmp_path):
    s3 = FakeS3()
    manifest = fetch_corpus(tmp_path, subjects=["01"], http=s3, log=lambda *a: None)
    assert len(manifest["files"]) == 3
    assert (tmp_path / "sub-01_task-imagine_run-01_eeg.pkl").read_bytes() == b"pkl-one"
    on_disk = json.loads((tmp_path / "manifest.json").read_text())
    assert on_disk["dataset"] == "ds005170"
    # second run: everything cached, no re-download GETs for files
    gets_before = len([u for u in s3.calls if "list-type" not in u])
    manifest2 = fetch_corpus(tmp_path, subjects=["01"], http=s3, log=lambda *a: None)
    gets_after = len([u for u in s3.calls if "list-type" not in u])
    assert gets_after == gets_before
    assert all(f["cached"] for f in manifest2["files"])


def test_fetch_size_mismatch_raises(tmp_path):
    s3 = FakeS3()
    orig = s3.__call__

    def corrupt(method, url):
        status, body = orig(method, url)
        if url.endswith("run-01_eeg.pkl"):
            return status, body + b"extra"
        return status, body

    with pytest.raises(RuntimeError, match="size mismatch"):
        fetch_corpus(tmp_path, subjects=["01"], http=corrupt, log=lambda *a: None)


def test_download_resumes_part_file(tmp_path):
    from imagined_speech_translation_tpu.data.fetch import download_file

    payload = b"0123456789abcdef"
    dest = tmp_path / "big.pkl"
    part = tmp_path / "big.pkl.part"
    part.write_bytes(payload[:6])  # interrupted earlier download
    offsets = []

    def stream(url, offset):
        offsets.append(offset)
        return 206, iter([payload[offset:]])

    download_file("u://x", dest, len(payload), stream=stream, log=lambda *a: None)
    assert offsets == [6]  # resumed, not restarted
    assert dest.read_bytes() == payload
    assert not part.exists()


def test_download_restarts_when_server_ignores_range(tmp_path):
    from imagined_speech_translation_tpu.data.fetch import download_file

    payload = b"full-body"
    dest = tmp_path / "f.pkl"
    (tmp_path / "f.pkl.part").write_bytes(b"old")

    def stream(url, offset):
        return 200, iter([payload])  # Range unsupported: full body

    download_file("u://x", dest, len(payload), stream=stream, log=lambda *a: None)
    assert dest.read_bytes() == payload


def test_download_retries_transient_failure(tmp_path):
    from imagined_speech_translation_tpu.data.fetch import download_file

    payload = b"eventually-ok"
    dest = tmp_path / "r.pkl"
    calls = []

    def stream(url, offset):
        calls.append(offset)
        if len(calls) == 1:
            return 500, iter(())
        return (206, iter([payload[offset:]])) if offset else (200, iter([payload]))

    download_file("u://x", dest, len(payload), stream=stream, log=lambda *a: None)
    assert len(calls) == 2
    assert dest.read_bytes() == payload


def test_download_truncated_stream_resumes_midfile(tmp_path):
    from imagined_speech_translation_tpu.data.fetch import download_file

    payload = b"x" * 10
    dest = tmp_path / "t.pkl"
    calls = []

    def stream(url, offset):
        calls.append(offset)
        if len(calls) == 1:
            return 200, iter([payload[:4]])  # connection drops mid-file
        return 206, iter([payload[offset:]])

    download_file("u://x", dest, len(payload), stream=stream, log=lambda *a: None)
    assert calls == [0, 4]  # second attempt resumed at the break
    assert dest.read_bytes() == payload


def test_download_completes_full_part_without_refetch(tmp_path):
    """A .part already holding all bytes (killed between final write and
    rename) finishes with a rename — no Range-from-EOF request that the
    server would answer 416 forever."""
    from imagined_speech_translation_tpu.data.fetch import download_file

    payload = b"0123456789abcdef"
    dest = tmp_path / "done.pkl"
    (tmp_path / "done.pkl.part").write_bytes(payload)

    def stream(url, offset):  # any network touch is the bug
        raise AssertionError("server must not be contacted")

    download_file("u://x", dest, len(payload), stream=stream, log=lambda *a: None)
    assert dest.read_bytes() == payload
    assert not (tmp_path / "done.pkl.part").exists()
