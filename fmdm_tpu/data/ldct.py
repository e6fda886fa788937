"""
Low-dose CT dataset family: paired SDCT/LDCT volumes, HU conversion, CT
windowing to [0,1], per-slice volume expansion, PNG+DICOM output writers.

Behavioral parity targets (/root/reference/src/datasets/ldct.py:25-349 and
dataframe_utils.py:8-24): the same index-expansion rules (cases with
mismatched slice counts are skipped), the same HU pipeline
(pixel*slope+intercept from DICOM tags, resize, window [lo,hi] -> [0,1],
leading channel dim), the same lot-id naming scheme, and the same output
formats (PNG + 12-bit DICOM with rescale/spacing propagation, .npy fallback
without pydicom).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
import pandas as pd

from fmdm_tpu.data.base import BaseDataset
from fmdm_tpu.data.dataset_utils import (
    absolute_path,
    cache_path_for_entry,
    maybe_unwrap,
    resolve_entry,
    save_tensor_cache,
    split_volume_entry,
)
from fmdm_tpu.data.io import resize_array

try:
    from PIL import Image as PILImage
except Exception:  # pragma: no cover
    PILImage = None

try:
    import pydicom
    from pydicom.dataset import Dataset as DICOMDataset
    from pydicom.dataset import FileDataset
except Exception:  # pragma: no cover - optional dependency
    pydicom = DICOMDataset = FileDataset = None

# CT window bounds: full soft-tissue-to-bone HU range, matching the
# reference's preprocess defaults.
HU_WINDOW_LO = -1024.0
HU_WINDOW_HI = 3072.0


def _stem(path_like) -> str:
    """Filename without directory or extension ("a/b/012.dcm" -> "012")."""
    return os.path.basename(str(path_like)).split(".")[0]


def lot_id(df: pd.DataFrame, case_column: str, number_column: str) -> pd.DataFrame:
    """Rewrite each row's case id into a unique lot name encoding the row's
    file range: I<case>S<row>F<first-stem>T<last-stem>C<count>. Rows whose
    file column is not a non-empty list keep their original id. Same naming
    scheme as the reference's dataframe lot-id helper."""
    df = df.copy()
    for idx in df.index:
        files = df.at[idx, number_column]
        if isinstance(files, (list, tuple)) and files:
            case = df.at[idx, case_column]
            df.at[idx, case_column] = (
                f"I{case}S{idx}F{_stem(files[0])}T{_stem(files[-1])}C{len(files)}"
            )
    return df


def _meta_lookup(meta: Optional[dict], spaced: str, camel: str, default=None):
    """DICOM metadata keys appear both space-separated ("Rescale Slope") and
    CamelCase ("RescaleSlope") depending on the loader; check both."""
    if meta is None:
        return default
    return meta.get(spaced, meta.get(camel, default))


class LDCTDataset(BaseDataset):
    """Paired-volume CT dataset. Each row of the split file names a case and
    its SDCT/LDCT volumes (single files or DICOM directories); the index
    expands every case into per-window samples carrying split_index/count
    metadata for the tensor cache."""

    def __init__(
        self,
        file_path: str,
        train: bool = True,
        img_size=None,
        window_size: int = 1,
        norm: bool = True,
        img_datatype=np.float32,
        transforms=None,
        load_ldct: bool = False,
        names: Tuple[str, ...] = ("Case", "SDCT", "LDCT"),
        split_file=None,
        use_tensor_cache: bool = True,
        save_tensor_cache: bool = False,
        cache_subdir: str = "cache",
        preprocess_kwargs: Optional[dict] = None,
    ):
        super().__init__(
            file_path=file_path,
            train=train,
            img_size=img_size,
            norm=norm,
            img_datatype=img_datatype,
            transforms=transforms,
            conditioning=load_ldct,
            id_key="Case",
            target_key=names[1],
            conditioning_key=names[2],
            split_names=names,
            split_file=split_file,
            use_tensor_cache=use_tensor_cache,
            save_tensor_cache=save_tensor_cache,
            cache_subdir=cache_subdir,
            preprocess_kwargs=preprocess_kwargs,
        )
        self.names = names
        self.window_size = int(window_size) if window_size is not None else 1
        self._build_ldct_index(names)

    # -- index construction ----------------------------------------------------
    def _windows_for(self, raw_entry) -> list:
        """Expand one volume reference (file path or DICOM dir) into its
        per-window entries."""
        path = absolute_path(self.data_root, raw_entry)
        if path.is_dir():
            return resolve_entry(self.data_root, raw_entry, self.window_size)
        return split_volume_entry(str(path), self.window_size)

    @staticmethod
    def _window_record(window_entry, position: int, total: int):
        """Normalize a window entry to (entry, split_index, split_count)."""
        entry = maybe_unwrap(window_entry) if isinstance(window_entry, (list, tuple)) else window_entry
        if isinstance(entry, dict):
            return entry, entry.get("split_index"), entry.get("split_count", total)
        return entry, position, total

    def _build_ldct_index(self, names: Tuple[str, ...]) -> None:
        case_col, target_col, cond_col = names[0], names[1], names[2]
        df = self._read_split_file(self.data_root, names=names).dropna().reset_index(drop=True)

        records = []
        n_cases = 0
        for _, row in df.iterrows():
            target_windows = self._windows_for(row[target_col])
            cond_windows = self._windows_for(row[cond_col])
            if len(target_windows) != len(cond_windows):
                logging.warning(
                    "Skipping case %s due to mismatched slice counts (SDCT=%d, LDCT=%d)",
                    row[case_col], len(target_windows), len(cond_windows),
                )
                continue
            n_cases += 1
            for pos, (tgt_win, cond_win) in enumerate(zip(target_windows, cond_windows)):
                tgt, tgt_idx, tgt_cnt = self._window_record(tgt_win, pos, len(target_windows))
                cond, cond_idx, cond_cnt = self._window_record(cond_win, pos, len(cond_windows))
                records.append({
                    case_col: row[case_col],
                    target_col: tgt,
                    cond_col: cond,
                    f"{target_col}__split_index": tgt_idx,
                    f"{target_col}__split_count": tgt_cnt,
                    f"{cond_col}__split_index": cond_idx,
                    f"{cond_col}__split_count": cond_cnt,
                })
        if not records:
            raise ValueError("Empty Dataset")

        indexed = lot_id(pd.DataFrame(records), case_col, target_col)
        self.data = indexed.to_dict("records")
        self.size = len(self.data)
        logging.info(
            "LDCT index built: %d cases expanded to %d samples (window_size=%d).",
            n_cases, self.size, self.window_size,
        )

    def _cache_info(self, entry, row, key: Optional[str]):
        if key is None:
            return None, 1
        return row.get(f"{key}__split_index"), row.get(f"{key}__split_count", 1)

    # -- HU preprocessing (parity: ldct.py:116-159) -----------------------------
    def preprocess(self, payload, MIN_B: float = HU_WINDOW_LO, MAX_B: float = HU_WINDOW_HI,
                   slope: float = 1.0, intersept: float = -1024) -> np.ndarray:
        """Raw pixels -> windowed [0,1] image with a leading channel dim.

        slope/intersept defaults are overridden by DICOM rescale tags when the
        payload carries metadata; absent tags keep the CT-standard fallback
        (slope 1, intercept -1024)."""
        img = payload["Image"] if isinstance(payload, dict) else payload
        meta = payload.get("Metadata") if isinstance(payload, dict) else None
        try:
            slope = float(_meta_lookup(meta, "Rescale Slope", "RescaleSlope", slope))
            intersept = float(_meta_lookup(meta, "Rescale Intercept", "RescaleIntercept", intersept))
        except (TypeError, ValueError):
            pass

        hu = np.asarray(img) * slope + intersept
        hu = self._resize_slices(hu)
        windowed = self.to_image(hu, MIN_B=MIN_B, MAX_B=MAX_B)
        if windowed.ndim == 2:
            windowed = windowed[np.newaxis]
        return windowed.astype(self.img_datatype)

    def _resize_slices(self, img: np.ndarray) -> np.ndarray:
        if self.img_size is None:
            return img
        if img.ndim == 3:
            # resize operates on trailing spatial dims: slices -> channels-last
            chw = np.transpose(resize_array(
                np.transpose(img, (1, 2, 0)), self.img_size + (img.shape[0],)
            ), (2, 0, 1))
            return chw
        return resize_array(img, self.img_size)

    def to_image(self, img: np.ndarray, MIN_B: float = HU_WINDOW_LO, MAX_B: float = HU_WINDOW_HI) -> np.ndarray:
        """HU -> [0,1] window (invertible by from_image)."""
        img = np.asarray(img)
        if self.norm:
            img = (img - MIN_B) / ((MAX_B - MIN_B) if MAX_B != MIN_B else 1.0)
        return np.clip(img, 0.0, 1.0).astype(self.img_datatype)

    def from_image(self, img, MIN_B: float = HU_WINDOW_LO, MAX_B: float = HU_WINDOW_HI):
        """[0,1] window -> HU."""
        img = np.clip(np.asarray(img), 0.0, 1.0)
        return (img * (MAX_B - MIN_B) + MIN_B).astype(self.img_datatype)

    # -- output writers (parity: ldct.py:161-271) --------------------------------
    def save_output(self, row: dict, key: str, tensor, output_root: Path) -> None:
        """Write a model output back under output_root, mirroring the source
        entry's cache layout: 2D slices as PNG+DICOM pairs, 3D volumes as
        per-slice DICOM dirs, anything else as a raw tensor cache file."""
        entry = row.get(key)
        split_index, split_count = self._cache_info(entry, row, key)
        out_path = cache_path_for_entry(self.base_path, output_root, entry, split_index, split_count)
        if out_path is None:
            return
        out_path.parent.mkdir(parents=True, exist_ok=True)

        arr = np.asarray(tensor, dtype=np.float32)
        if arr.ndim == 4 and arr.shape[0] == 1:
            arr = arr[0]
        source_meta = self._source_metadata(row, key)

        single_slice = arr.ndim == 2 or (arr.ndim == 3 and arr.shape[0] == 1)
        if single_slice:
            img2d = arr if arr.ndim == 2 else arr[0]
            self._save_png(img2d, out_path.with_suffix(".png"))
            self._save_dicom_slice(img2d, out_path.with_suffix(".dcm"), metadata=source_meta)
        elif arr.ndim == 3:
            vol_dir = out_path.with_suffix("")
            vol_dir.mkdir(parents=True, exist_ok=True)
            for idx, img2d in enumerate(arr):
                self._save_dicom_slice(img2d, vol_dir / f"slice_{idx:04d}.dcm", metadata=source_meta)
        else:
            save_tensor_cache(arr, out_path)

    def _source_metadata(self, row: dict, key: str):
        """Re-read the source entry to propagate its DICOM metadata into
        outputs; any load failure just drops the metadata."""
        entry = row.get(key)
        if entry is not None:
            item_id = row.get(self.id_key) if self.id_key else None
            try:
                payload = self._load_entry(entry, item_id)
            except Exception:
                return None
            if isinstance(payload, dict):
                return payload.get("Metadata")
        return None

    @staticmethod
    def _save_png(img: np.ndarray, path: Path) -> None:
        if PILImage is None:
            return
        u8 = (np.clip(img, 0.0, 1.0) * 255.0).round().astype(np.uint8)
        PILImage.fromarray(u8, mode="L").save(path)

    @staticmethod
    def _save_dicom_slice(img: np.ndarray, path: Path, metadata: Optional[dict] = None) -> None:
        if pydicom is None or FileDataset is None or DICOMDataset is None:
            # same graceful degradation as the reference when pydicom is absent
            np.save(path.with_suffix(".npy"), np.asarray(img, dtype=np.float32))
            return

        px = np.asarray(np.clip(img, 0.0, 1.0) * 4095.0, dtype=np.uint16)  # 12-bit CT range

        file_meta = DICOMDataset()
        for uid_tag in ("MediaStorageSOPClassUID", "MediaStorageSOPInstanceUID"):
            setattr(file_meta, uid_tag, pydicom.uid.generate_uid())
        file_meta.TransferSyntaxUID = pydicom.uid.ExplicitVRLittleEndian

        ds = FileDataset(str(path), {}, file_meta=file_meta, preamble=b"\0" * 128)
        header = {
            "SOPClassUID": file_meta.MediaStorageSOPClassUID,
            "SOPInstanceUID": file_meta.MediaStorageSOPInstanceUID,
            "Modality": "CT",
            "Rows": int(px.shape[0]),
            "Columns": int(px.shape[1]),
            # monochrome 16-bit-allocated pixel cells
            "SamplesPerPixel": 1,
            "PhotometricInterpretation": "MONOCHROME2",
            "BitsStored": 16,
            "BitsAllocated": 16,
            "HighBit": 15,
            "PixelRepresentation": 0,
            "RescaleSlope": float(_meta_lookup(metadata, "Rescale Slope", "RescaleSlope", 1)),
            "RescaleIntercept": float(_meta_lookup(metadata, "Rescale Intercept", "RescaleIntercept", -1024)),
        }
        for tag, value in header.items():
            setattr(ds, tag, value)
        if metadata is not None:
            LDCTDataset._propagate_geometry(ds, metadata)

        ds.PixelData = px.tobytes()
        ds.save_as(str(path), enforce_file_format=True)

    @staticmethod
    def _propagate_geometry(ds, metadata: dict) -> None:
        """Carry slice-geometry tags from the source DICOM into the output."""
        thickness = LDCTDataset._meta_float(metadata, "Slice Thickness", "SliceThickness")
        if thickness is not None:
            ds.SliceThickness = float(thickness)
        between = LDCTDataset._meta_float(metadata, "Spacing Between Slices", "SpacingBetweenSlices")
        if between is not None:
            ds.SpacingBetweenSlices = float(between)
        spacing = LDCTDataset._parse_pixel_spacing(
            metadata.get("Pixel Spacing", metadata.get("PixelSpacing"))
        )
        if spacing is not None:
            ds.PixelSpacing = spacing

    @staticmethod
    def _parse_pixel_spacing(value):
        """PixelSpacing arrives as a 2-list or as a string like "[0.7\\0.7]";
        normalize to the 2-element string list pydicom expects."""
        if isinstance(value, str):
            for ch in "[]()":
                value = value.replace(ch, "")
            parts = [p.strip() for p in value.replace("\\", ",").split(",") if p.strip()]
            if len(parts) >= 2:
                return [str(float(parts[0])), str(float(parts[1]))]
            return None
        if isinstance(value, (list, tuple)) and len(value) >= 2:
            return [str(float(value[0])), str(float(value[1]))]
        return None

    @staticmethod
    def _meta_float(meta: dict, *keys: str):
        """First key whose value parses as a float, else None."""
        for value in filter(lambda v: v is not None, map(meta.get, keys)):
            try:
                return float(value)
            except Exception:
                pass
        return None


class LDCTAttentionDataset(LDCTDataset):
    """LDCT variant whose conditioning inputs bypass HU preprocessing —
    used when conditioning on precomputed VAE latents (parity:
    ldct.py:286-293)."""

    def _load_conditioning_tensor(self, row: dict, item_id):
        if self.conditioning_key is None:
            raise KeyError("Conditioning requested but no conditioning column provided.")
        return self._load_entry_tensor(row, item_id, self.conditioning_key, preprocess=False)


def build_ldct_from_config(training_cfg: dict, _model_cfg, train: bool):
    """Config factory (parity: ldct.py:298-320)."""
    return LDCTDataset(
        str(Path(training_cfg["data_root"])),
        train=train,
        img_size=training_cfg.get("img_size"),
        window_size=training_cfg.get("window_size", training_cfg.get("slice_count", 1)),
        norm=training_cfg.get("norm", True),
        load_ldct=bool(training_cfg.get("load_ldct", False)),
        use_tensor_cache=bool(training_cfg.get("use_tensor_cache", True)),
        save_tensor_cache=bool(training_cfg.get("save_tensor_cache", False)),
        cache_subdir=training_cfg.get("tensor_cache_subdir", "cache"),
        preprocess_kwargs=training_cfg.get("preprocess_kwargs"),
    )


def run_self_tests() -> None:
    """Embedded self-test (reference datasets/ldct.py self-test tier): lot-id
    naming, HU rescale + windowing round-trip, DICOM-tag override."""
    df = pd.DataFrame({"case": ["C1", "C2"], "files": [["a/001.npy", "a/003.npy"], None]})
    out = lot_id(df, "case", "files")
    assert out.at[0, "case"] == "IC1S0F001T003C2"
    assert out.at[1, "case"] == "C2"  # non-list rows keep their id

    ds = object.__new__(LDCTDataset)
    ds.norm = True
    ds.img_datatype = np.float32
    ds.img_size = None

    # raw CT pixels (unsigned) -> HU via fallback intercept -1024 -> [0,1]
    raw = np.array([[0.0, 1024.0], [2048.0, 4096.0]], np.float32)
    img = ds.preprocess(raw)
    assert img.shape == (1, 2, 2)
    assert img.min() >= 0.0 and img.max() <= 1.0
    hu = raw - 1024.0
    expected = np.clip((hu - HU_WINDOW_LO) / (HU_WINDOW_HI - HU_WINDOW_LO), 0, 1)
    np.testing.assert_allclose(img[0], expected, atol=1e-6)

    # DICOM rescale tags override the fallback
    tagged = ds.preprocess({"Image": raw, "Metadata": {"RescaleSlope": 1.0, "RescaleIntercept": 0.0}})
    np.testing.assert_allclose(
        tagged[0], np.clip((raw - HU_WINDOW_LO) / (HU_WINDOW_HI - HU_WINDOW_LO), 0, 1), atol=1e-6)

    # to_image/from_image inverse inside the window
    mid = np.array([[-500.0, 0.0], [100.0, 200.0]], np.float32)
    np.testing.assert_allclose(ds.from_image(ds.to_image(mid)), mid, atol=0.5)
