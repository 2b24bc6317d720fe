"""Corpus loaders: format dispatch + label-from-subdirectory convention.

Reference analogues re-expressed as distributed reads:
* ``csv_loader`` recursive glob with label = parent dir name
  (/root/reference/caits/loading/_csv_read.py:11,44) -> ``read_csv`` over the
  file list with a per-file ``source`` column derived from the path.
* ``load_dir`` / ``DataLoader.load_from`` format sniffing
  (/root/reference/caits/loading/_dataset_loader.py:53,
  /root/reference/caits/dataset/_loader.py:28) -> extension dispatch.
* ``audio_loader`` byte corpora (/root/reference/caits/loading/_audio.py:75)
  -> ``read_binary_files(include_paths=True)`` + actor-pool decode
  (pipelines/multimodal.py).
* S3 variants (/root/reference/caits/loading/_s3_csv_read.py:8): Ray's
  ``read_*`` accept ``s3://`` URIs directly -- same code path, no boto
  pagination logic needed.

Per-file errors: Ray retries tasks (lineage re-execution); the reference's
print-and-skip (/root/reference/caits/loading/_csv_read.py:57-58) becomes an
explicit ``on_error`` policy where supported.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd


def _source_from_path(path: str) -> str:
    """Label = parent directory name (the reference's class-subdir rule)."""
    return os.path.basename(os.path.dirname(path))


def resolve_filesystem(root: str, filesystem=None):
    """(filesystem, path) for a corpus root: local paths untouched; URI
    roots (``s3://...``) resolved via ``pyarrow.fs.FileSystem.from_uri``
    (the S3 loader path, /root/reference/caits/loading/_s3_csv_read.py:8 --
    no boto pagination logic: Ray ships the filesystem to read tasks); an
    explicit ``filesystem`` (pyarrow or fsspec) is honored as-is, which is
    also the mocked-filesystem test seam."""
    if filesystem is not None:
        try:
            import fsspec
            from pyarrow.fs import FSSpecHandler, PyFileSystem

            if isinstance(filesystem, fsspec.AbstractFileSystem):
                filesystem = PyFileSystem(FSSpecHandler(filesystem))
        except ImportError:
            pass
        return filesystem, root
    if "://" in root:
        from pyarrow.fs import FileSystem

        fs, path = FileSystem.from_uri(root)
        return fs, path
    return None, root


def _glob_suffix(root: str, suffix: str, filesystem=None) -> list[str]:
    """Recursive file listing filtered by suffix, on any filesystem."""
    if filesystem is None:
        import glob

        return sorted(
            glob.glob(os.path.join(root, "**", f"*{suffix}"), recursive=True)
        )
    from pyarrow.fs import FileSelector, FileType

    infos = filesystem.get_file_info(FileSelector(root, recursive=True))
    return sorted(
        i.path for i in infos if i.type == FileType.File and i.path.endswith(suffix)
    )


def load_csv_corpus(root: str, filesystem=None, **read_kwargs) -> rd.Dataset:
    """Recursive CSV corpus: one `source` label per parent dir.  ``root``
    may be a local path or a filesystem URI (``s3://bucket/corpus``);
    ``filesystem`` overrides resolution (pyarrow or fsspec instance)."""
    fs, root = resolve_filesystem(root, filesystem)
    files = _glob_suffix(root, ".csv", fs)
    ds = rd.read_csv(files, filesystem=fs, include_paths=True, **read_kwargs)

    def add_source(t: pa.Table) -> pa.Table:
        paths = t["path"].to_pylist()
        src = pa.array([_source_from_path(p) for p in paths], pa.string())
        return t.append_column("source", src).drop_columns(["path"])

    return ds.map_batches(add_source, batch_format="pyarrow")


def load_binary_corpus(root: str, suffix: str = "") -> rd.Dataset:
    """Binary (audio/image) corpus with path + source columns."""
    ds = rd.read_binary_files(root, include_paths=True)

    def shape(t: pa.Table) -> pa.Table:
        paths = t["path"].to_pylist()
        keep = [i for i, p in enumerate(paths) if p.endswith(suffix)]
        t = t.take(keep)
        paths = [paths[i] for i in keep]
        return pa.table(
            {
                "media_id": pa.array([os.path.basename(p) for p in paths]),
                "source": pa.array([_source_from_path(p) for p in paths]),
                "payload": t["bytes"],
            }
        )

    return ds.map_batches(shape, batch_format="pyarrow")


def load_dir(root: str, fmt: str | None = None) -> rd.Dataset:
    """Format dispatch by extension sniffing (``load_dir`` equivalent)."""
    import glob

    if fmt is None:
        for ext, f in (("parquet", "parquet"), ("csv", "csv"), ("wav", "binary")):
            if glob.glob(os.path.join(root, "**", f"*.{ext}"), recursive=True):
                fmt = f
                break
        else:
            raise ValueError(f"no recognized files under {root}")
    if fmt == "parquet":
        return rd.read_parquet(root)
    if fmt == "csv":
        return load_csv_corpus(root)
    if fmt == "binary":
        return load_binary_corpus(root)
    raise ValueError(fmt)


def wav_loader(
    file_path: str,
    target_sr: int | None = None,
    dtype: str = "float64",
) -> tuple:
    """Load a mono/multichannel WAV or FLAC file -> ``(audio (frames,
    channels), sample_rate)``, optionally resampled per channel -- the
    reference ``wav_loader`` semantics
    (/root/reference/caits/loading/_audio.py:16: soundfile
    ``always_2d=True`` normalization, which reads FLAC transparently) on
    the pure-NumPy RIFF decoder (functions/wavcodec.py) and the
    pure-Python FLAC decoder (functions/flaccodec.py), magic-dispatched."""
    from ..functions.preprocess import resample_2d
    from ..functions.wavcodec import decode_audio_bytes

    with open(file_path, "rb") as f:
        audio, sr = decode_audio_bytes(f.read(), dtype=dtype)
    if target_sr is not None and target_sr != sr:
        audio = resample_2d(audio, sr, target_sr)
        sr = target_sr
    return audio, sr


def wav_specs_check(wav_file_path: str, print_base: bool = False) -> dict:
    """WAV header specs via the stdlib ``wave`` module
    (caits/loading/_audio.py:137): sample rate, channels, frame count, etc.
    as a dict."""
    import wave

    with wave.open(wav_file_path, "rb") as wf:
        if print_base:
            n = wf.getnchannels()
            print(f"Sample rate: {wf.getframerate()} Hz")
            print(
                "Mono" if n == 1 else "Stereo" if n == 2 else f"Multi-channel: ({n} channels)"
            )
        return wf.getparams()._asdict()


def load_yaml_config(config_path: str) -> dict:
    """YAML config file -> dict (caits/loading/_utils.py:10)."""
    import yaml

    try:
        with open(config_path, "r") as f:
            return yaml.safe_load(f)
    except FileNotFoundError as e:
        raise FileNotFoundError(f"Configuration file not found: {config_path}") from e
    except yaml.YAMLError as e:
        raise yaml.YAMLError(
            f"Error parsing YAML configuration: {config_path}"
        ) from e


def json_loader(dataset_path: str, classes: list[str] | None = None) -> dict:
    """JSON corpus directory -> {stem: contents} dict, optionally restricted
    to class subdirectories (caits/loading/_utils.py:42)."""
    import glob
    import json

    out: dict = {}
    pattern = os.path.join(dataset_path, "**", "*.json")
    for p in sorted(glob.glob(pattern, recursive=True)):
        if classes is not None and _source_from_path(p) not in classes:
            continue
        with open(p) as f:
            out[os.path.splitext(os.path.basename(p))[0]] = json.load(f)
    return out
