"""Generate golden parity fixtures by executing the reference implementation.

Run manually (CPU, needs torch + the vendored kymatio):
    python tests/make_golden.py

Writes tests/golden/*.npz holding reference outputs for fixed random inputs.
Only *data* is taken from the reference — no code.
"""

import os
import sys

import numpy as np

import scipy.special as sp
if not hasattr(sp, "sph_harm"):  # vendored kymatio predates SciPy's rename
    sp.sph_harm = sp.sph_harm_y

sys.path.insert(0, "/root/reference/kymatio")
sys.path.insert(0, "/root/reference/hdf5_dataset")

import torch  # noqa: E402
from kymatio_phase_scattering import KymatioPhaseScattering1D  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "golden")
os.makedirs(OUT, exist_ok=True)


def golden_case(name, J, Q, T, N, max_order, batch=2, cross=False, seed=0):
    rng = np.random.default_rng(seed)
    dev = torch.device("cpu")
    m = KymatioPhaseScattering1D(J=J, Q=Q, T=T, shape=N, device=dev,
                                 max_order=max_order)
    m = m.double() if False else m
    record = {
        "J": J, "Q": Q, "T": T, "N": N, "max_order": max_order,
        "J_pad": m.J_pad, "pad_left": m.pad_left, "pad_right": m.pad_right,
        "N_padded": m.N_padded,
        "center_freqs": m.center_freqs.numpy(),
        "i_idx": m.i_idx.numpy(), "j_idx": m.j_idx.numpy(),
        "powers": m.powers.numpy(), "autoc_idx": m.autoc_idx.numpy(),
        "psi1_filters": m.psi1_filters.resolve_conj().numpy(),
        "phi_filter": m.phi_filter.resolve_conj().numpy(),
    }
    if cross:
        x = rng.standard_normal((batch, 2, N)).astype(np.float32)
        with torch.no_grad():
            out = m(torch.from_numpy(x), compute_phase=False,
                    compute_cross_phase=True)
        record["x"] = x
        record["scattering"] = out["scattering"].numpy()
        record["cross_phase_corr"] = out["cross_phase_corr"].numpy()
    else:
        x = rng.standard_normal((batch, N)).astype(np.float32)
        with torch.no_grad():
            out = m(torch.from_numpy(x), compute_phase=True,
                    compute_cross_phase=False)
        record["x"] = x
        record["scattering"] = out["scattering"].numpy()
        record["phase_corr"] = out["phase_corr"].numpy()

    sel = m.get_optimal_coefficients_for_fhr(J, Q, T)
    record["use_phase_mask"] = sel["recommendations"]["use_phase_mask"].numpy()
    record["use_cross_mask"] = sel["recommendations"]["use_cross_mask"].numpy()

    np.savez_compressed(os.path.join(OUT, name + ".npz"), **record)
    print(f"wrote {name}: scattering {record['scattering'].shape}")


def golden_mi(name="mi_gaussian", seed=7):
    """Reference Gaussian MI estimator outputs on fixed inputs
    (utils/metrics_utils.py:8-82). Executed ONCE here at fixture-build time
    so tests never exec the untrusted reference tree at test time."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_metrics", "/root/reference/utils/metrics_utils.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    rng = np.random.default_rng(seed)
    n, t = 400, 6
    z = rng.standard_normal((n, t, 3))
    x = np.concatenate([z + 0.3 * rng.standard_normal((n, t, 3)),
                        rng.standard_normal((n, t, 2))], axis=2)
    y = np.concatenate([z[:, :, :2] + 0.5 * rng.standard_normal((n, t, 2)),
                        rng.standard_normal((n, t, 1))], axis=2)
    record = {"x": x, "y": y}
    for reduce_dim in (False, True):
        record[f"mi_reduce{int(reduce_dim)}"] = ref.compute_mutual_information(
            x, y, reduce_dim=reduce_dim, n_components_X=10, n_components_Y=5)
    np.savez_compressed(os.path.join(OUT, name + ".npz"), **record)
    print(f"wrote {name}: mi={record['mi_reduce0']}, "
          f"mi_reduced={record['mi_reduce1']}")


if __name__ == "__main__":
    golden_mi()
    # Small config exercises order 2 + both phase paths quickly.
    golden_case("small_o2_phase", J=6, Q=2, T=8, N=1024, max_order=2, seed=1)
    golden_case("small_o2_cross", J=6, Q=2, T=8, N=1024, max_order=2,
                cross=True, seed=2)
    # Production config (J=11, Q=4, T=16, N=5760), order 1.
    golden_case("prod_phase", J=11, Q=4, T=16, N=5760, max_order=1, seed=3)
    golden_case("prod_cross", J=11, Q=4, T=16, N=5760, max_order=1,
                cross=True, seed=4)
