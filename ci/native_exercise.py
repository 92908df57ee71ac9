"""Drive every native entry point (CSV parser, MST) for the sanitizer lane.

Run with ALBATROSS_NATIVE_LIB pointing at the ASan/UBSan build and libasan
LD_PRELOADed (ci/run_native_asan.sh); any heap error aborts the process.
"""

import os
import tempfile

import numpy as np


def main() -> int:
    import albatross_tpu._native as native

    # CSV round trip through the native parser
    with tempfile.NamedTemporaryFile(
        "w", suffix=".csv", delete=False
    ) as fh:
        fh.write("a,b,c\n1,2.5,-3\n3,4.5,6\n10,0.25,9\n")
        path = fh.name
    try:
        cols = native.parse_csv(path)
        assert set(cols) == {"a", "b", "c"}, cols
        np.testing.assert_allclose(cols["a"], [1.0, 3.0, 10.0])
        np.testing.assert_allclose(cols["b"], [2.5, 4.5, 0.25])
    finally:
        os.unlink(path)

    # Kruskal MST through the native path
    a = np.asarray([0, 1, 0, 2])
    b = np.asarray([1, 2, 2, 3])
    cost = np.asarray([1.0, 2.0, 10.0, 1.5])
    mask = native.mst_kruskal(a, b, cost)
    assert mask.tolist() == [True, True, False, True], mask
    print("native entry points exercised:", native._lib is not None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
