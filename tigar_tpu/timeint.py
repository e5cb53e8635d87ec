"""Time integrators: backward Euler, generalized-alpha, load stepping, and
linear space-time DG.

Same formulas as the reference (tIGAr/timeIntegration.py), re-designed for
the JAX setting: integrators act on *any* linear structure -- DoF arrays for
history updates, field Jets inside assembly densities -- because every
formula is a fixed linear combination of the unknown and history states.
State dictionaries use the assembly convention of models/extracted.py: the
unknown under key "u", history under "x_old"/"xdot_old"/"xddot_old".
"""

from __future__ import annotations



def x_alpha(alpha, x, x_old):
    """alpha-level quantity (reference: timeIntegration.py:95-100)."""
    return alpha * x + (1.0 - alpha) * x_old


class BackwardEulerIntegrator:
    """Backward Euler for 1st- or 2nd-order ODE systems
    (reference: timeIntegration.py:13-68)."""

    def __init__(self, delta_t, x, old_functions, t=0.0):
        self.system_order = len(old_functions)
        self.delta_t = float(delta_t)
        self.x = x
        self.x_old = old_functions[0]
        if self.system_order == 2:
            self.xdot_old = old_functions[1]
        self.t = t + self.delta_t

    def xdot_of(self, s):
        return (s["u"] - s["x_old"]) * (1.0 / self.delta_t)

    def xddot_of(self, s):
        return (self.xdot_of(s) - s["xdot_old"]) * (1.0 / self.delta_t)

    def state(self):
        """State dict for assembly (unknown "u" = self.x)."""
        out = {"u": self.x, "x_old": self.x_old}
        if self.system_order == 2:
            out["xdot_old"] = self.xdot_old
        return out

    def xdot(self):
        return self.xdot_of(self.state())

    def xddot(self):
        return self.xddot_of(self.state())

    def advance(self):
        if self.system_order == 2:
            self.xdot_old = self.xdot()
        self.x_old = self.x
        self.t += self.delta_t


class LoadStepper:
    """Pseudo-time bookkeeping for quasi-static problems
    (reference: timeIntegration.py:70-93)."""

    def __init__(self, delta_t, t=0.0):
        self.delta_t = float(delta_t)
        self.t = t
        self.advance()

    def advance(self):
        self.t += self.delta_t


class GeneralizedAlphaIntegrator:
    """Generalized-alpha for 1st- and 2nd-order systems
    (reference: timeIntegration.py:102-247).  Includes the implicit midpoint
    rule as RHO_INF = 1.

    For 1st-order systems ``old_functions`` = (x_old, xdot_old); a third
    entry (xddot_old) makes the system 2nd-order.
    """

    def __init__(self, rho_inf, delta_t, x, old_functions, t=0.0,
                 use_first_order_alpha_m=False):
        self.rho_inf = float(rho_inf)
        self.delta_t = float(delta_t)
        self.system_order = len(old_functions) - 1
        if use_first_order_alpha_m or self.system_order == 1:
            self.alpha_m = 0.5 * (3.0 - self.rho_inf) / (1.0 + self.rho_inf)
        else:
            self.alpha_m = (2.0 - self.rho_inf) / (1.0 + self.rho_inf)
        self.alpha_f = 1.0 / (1.0 + self.rho_inf)
        self.gamma = 0.5 + self.alpha_m - self.alpha_f
        self.beta = 0.25 * (1.0 + self.alpha_m - self.alpha_f) ** 2
        self.x = x
        self.x_old = old_functions[0]
        self.xdot_old = old_functions[1]
        if self.system_order == 2:
            self.xddot_old = old_functions[2]
        self.t = t + self.delta_t

    # -- generic formulas on state dicts (arrays or Jets) ----------------------

    def xdot_of(self, s):
        dt, g, b = self.delta_t, self.gamma, self.beta
        if self.system_order == 1:
            return (s["u"] * (1.0 / (g * dt))
                    + s["x_old"] * (-1.0 / (g * dt))
                    + s["xdot_old"] * ((g - 1.0) / g))
        return (s["u"] * (g / (b * dt))
                + s["x_old"] * (-g / (b * dt))
                + s["xdot_old"] * (1.0 - g / b)
                + s["xddot_old"] * ((1.0 - g) * dt
                                    - (1.0 - 2.0 * b) * dt * g / (2.0 * b)))

    def xddot_of(self, s):
        dt, g = self.delta_t, self.gamma
        return (self.xdot_of(s) * (1.0 / (dt * g))
                + s["xdot_old"] * (-1.0 / (dt * g))
                + s["xddot_old"] * (-(1.0 - g) / g))

    def x_alpha_of(self, s):
        return x_alpha(self.alpha_f, s["u"], s["x_old"])

    def xdot_alpha_of(self, s):
        alpha = self.alpha_m if self.system_order == 1 else self.alpha_f
        return x_alpha(alpha, self.xdot_of(s), s["xdot_old"])

    def xddot_alpha_of(self, s):
        return x_alpha(self.alpha_m, self.xddot_of(s), s["xddot_old"])

    # -- array-state convenience -------------------------------------------------

    def state(self):
        out = {"u": self.x, "x_old": self.x_old, "xdot_old": self.xdot_old}
        if self.system_order == 2:
            out["xddot_old"] = self.xddot_old
        return out

    def xdot(self):
        return self.xdot_of(self.state())

    def xddot(self):
        return self.xddot_of(self.state())

    def x_alpha(self):
        return self.x_alpha_of(self.state())

    def xdot_alpha(self):
        return self.xdot_alpha_of(self.state())

    def xddot_alpha(self):
        return self.xddot_alpha_of(self.state())

    def same_velocity_predictor(self):
        """Predictor keeping the 'velocity' constant
        (reference: timeIntegration.py:210-224)."""
        if self.system_order == 1:
            return self.x_old
        dt, g, b = self.delta_t, self.gamma, self.beta
        return (self.x_old + dt * self.xdot_old
                + 0.5 * dt ** 2 * ((1.0 - 2.0 * b)
                                   + 2.0 * b * (g - 1.0) / g) * self.xddot_old)

    def advance(self):
        """Rotate history (reference: timeIntegration.py:228-247)."""
        xdot_new = self.xdot()
        if self.system_order == 2:
            self.xddot_old = self.xddot()
        self.x_old = self.x
        self.xdot_old = xdot_new
        self.t += self.delta_t


class LinearDGSpaceTimeIntegrator:
    """Third-order space-time DG with linear shape functions in time
    (reference: timeIntegration.py:249-366).  Unknowns live in a doubled
    (mixed) space: the first half of the fields are values at the past edge
    of the time slab, the second half at the future edge."""

    def __init__(self, delta_t, x, x_old, t=0.0, n_time_quad_pts=2):
        from .ops.quadrature import gauss_rule
        self.quad_pts, self.quad_wts = gauss_rule(n_time_quad_pts)
        self.n_time_quad_pts = n_time_quad_pts
        self.delta_t = float(delta_t)
        self.t_n = t
        self.x = x
        self.x_old = x_old

    @staticmethod
    def _half(x, i):
        """Extract the i-th temporal node's fields from a doubled structure
        (array or Jet with leading component axis).  A single field per time
        node is returned as a scalar (reference: x_i, timeIntegration.py:
        284-292)."""
        n = x.val.shape[0] // 2 if hasattr(x, "val") else x.shape[0] // 2
        if n == 1:
            return x[i]
        return x[slice(i * n, (i + 1) * n)]

    def t_hat_to_t(self, t_hat):
        a = 0.5 * (t_hat + 1.0)
        return a * (self.t_n + self.delta_t) + (1.0 - a) * self.t_n

    def t_to_t_hat(self, t):
        a = (t - self.t_n) / self.delta_t
        return 2.0 * a - 1.0

    def int_dt(self, form):
        """Integrate ``form(t)`` (a scalar density already integrated in
        space) over the current slab with the Gauss rule in time."""
        total = 0.0
        for i in range(self.n_time_quad_pts):
            w = 0.5 * self.delta_t * float(self.quad_wts[i])
            t = self.t_hat_to_t(float(self.quad_pts[i]))
            total = total + w * form(t)
        return total

    def f(self, x):
        """Time-interpolant of a doubled structure within the slab."""
        def interp(t):
            t_hat = self.t_to_t_hat(t)
            x0 = self._half(x, 0)
            x1 = self._half(x, 1)
            return x0 * (0.5 * (1.0 - t_hat)) + x1 * (0.5 * (1.0 + t_hat))
        return interp

    def f_t(self, x):
        """Constant-in-time temporal derivative of the linear interpolant."""
        return (self._half(x, 1) - self._half(x, 0)) * (1.0 / self.delta_t)

    def at_future_bdry(self, x):
        return self._half(x, 1)

    def at_past_bdry(self, x):
        return self._half(x, 0)

    def advance(self):
        self.x_old = self.x
        self.t_n += self.delta_t
