"""I/O helper tests — the numeric CSV loader's shape and finiteness guards."""

import numpy as np
import pytest

from shm_tpu.utils.io import load_csv_numeric


def _write_csv(path, rows):
    with open(path, "w") as f:
        f.write("a,b,c\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")


def test_load_csv_numeric_roundtrip(tmp_path):
    p = tmp_path / "run.csv"
    _write_csv(p, [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    X = load_csv_numeric(p, num_features=3)
    np.testing.assert_allclose(X, [[1, 2, 3], [4, 5, 6]])
    assert X.dtype == np.float32


def test_load_csv_numeric_shape_guard(tmp_path):
    p = tmp_path / "run.csv"
    _write_csv(p, [[1.0, 2.0, 3.0]])
    with pytest.raises(ValueError, match="shape"):
        load_csv_numeric(p, num_features=12)


def test_load_csv_numeric_rejects_nan_cells(tmp_path):
    """pandas parses 'NaN'/empty cells silently; the loader must stay loud
    (np.loadtxt, the reference's parser, raised here)."""
    p = tmp_path / "run.csv"
    _write_csv(p, [[1.0, "NaN", 3.0], [4.0, 5.0, 6.0]])
    with pytest.raises(ValueError, match="Non-finite"):
        load_csv_numeric(p, num_features=3)


def test_load_csv_numeric_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_csv_numeric(tmp_path / "absent.csv")
