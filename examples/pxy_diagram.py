"""Isothermal p-x-y diagram of propane / n-butane in one batched solve.

The composition grid is the batch axis: 51 bubble-point solves (plus their
incipient-vapor compositions) run as a single fixed-shape TPU program, warm
started from the Raoult estimate built on the pure-component solver.

Run:  python examples/pxy_diagram.py
"""

import numpy as np

from feos_tpu.diagrams import binary_pxy

# m, sigma, epsilon_k, mu, kappa_ab, epsilon_k_ab, na, nb
# (Gross & Sadowski 2001 pure-component parameters)
PROPANE = [2.0020, 3.6184, 208.11, 0, 0, 0, 0, 0]
BUTANE = [2.3316, 3.7086, 222.88, 0, 0, 0, 0, 0]

T = 300.0  # K


def main():
    d = binary_pxy(np.array([PROPANE, BUTANE]), None, T, n_points=51)
    x1, y1, p = (np.asarray(a) for a in (d.x1, d.y1, d.p))
    print(f"# propane(1) / n-butane(2) at T = {T} K")
    print(f"# {'x1':>8} {'y1':>8} {'p/bar':>10}")
    for i in range(0, 51, 5):
        print(f"  {x1[i]:8.4f} {y1[i]:8.4f} {p[i] / 1e5:10.4f}")
    assert not np.any(np.asarray(d.nans))


if __name__ == "__main__":
    main()
