"""Isobaric T-x-y diagram of propane / n-butane in one batched solve.

The temperature-explicit dual of examples/pxy_diagram.py: the composition
grid is the batch axis of a single saturation-TEMPERATURE solve
(models.pcsaft_mix.bubble_point_t — a secant outer iteration over
warm-started bubble-pressure solves; solvers/tsolve.py).  Initial
temperatures come from the mole-fraction mix of the pure boiling points,
the T-side analog of the Raoult warm start.

Run:  python examples/txy_diagram.py
"""

import numpy as np

from feos_tpu.diagrams import binary_txy

# m, sigma, epsilon_k, mu, kappa_ab, epsilon_k_ab, na, nb
# (Gross & Sadowski 2001 pure-component parameters)
PROPANE = [2.0020, 3.6184, 208.11, 0, 0, 0, 0, 0]
BUTANE = [2.3316, 3.7086, 222.88, 0, 0, 0, 0, 0]

P = 3e5  # Pa


def main():
    d = binary_txy(np.array([PROPANE, BUTANE]), None, P, n_points=51)
    x1, y1, t = (np.asarray(a) for a in (d.x1, d.y1, d.t))
    print(f"# propane(1) / n-butane(2) at p = {P / 1e5:.1f} bar")
    print(f"# {'x1':>8} {'y1':>8} {'T/K':>10}")
    for i in range(0, 51, 5):
        print(f"  {x1[i]:8.4f} {y1[i]:8.4f} {t[i]:10.4f}")
    assert not np.any(np.asarray(d.nans))


if __name__ == "__main__":
    main()
