"""
COSMO 2-metre-temperature station operator.

Rebuild of /root/reference/pytassim/obs_ops/terrsysmp/cos_t2m.py:46-215: map a
COSMO analysis state onto T2m station observations by (1) nearest-neighbor
station matching on Earth-radius cartesian coordinates (cKDTree), (2) a
model-derived lapse rate between two model levels, and (3) the COSMO user
guide's height correction ``T2m_station = T2m_model + lapse * (h_station -
h_model)``.

Instead of the reference's pandas station DataFrame with German DWD column
names (cos_t2m.py:116-118 reads 'Breite'/'Länge'/'Stations-höhe'), stations
are passed as plain (lat, lon, alt) arrays; instead of MultiIndex ``.sel``
lookups the operator precomputes flat gather indices into the stacked
``(rlat, rlon, vgrid)`` grid, so ``jax_operator`` is one static ``take`` —
fully jit/vmap/grad-compatible.
"""

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from tpu_assim.obs_ops.base_ops import BaseOperator
from tpu_assim.state import EnsembleState

__all__ = ["CosmoT2mOperator", "EARTH_RADIUS"]

EARTH_RADIUS = 6371000.0  # (reference: cos_t2m.py:43)


def _get_cartesian(lat: np.ndarray, lon: np.ndarray, alt: np.ndarray
                   ) -> np.ndarray:
    """lat/lon (deg) + altitude (m) -> cartesian x, y, z
    (reference: cos_t2m.py:106-114 — altitude enters only the z component)."""
    lat_rad = np.deg2rad(lat)
    lon_rad = np.deg2rad(lon)
    x = EARTH_RADIUS * np.cos(lat_rad) * np.cos(lon_rad)
    y = EARTH_RADIUS * np.cos(lat_rad) * np.sin(lon_rad)
    z = EARTH_RADIUS * np.sin(lat_rad) + alt
    return np.stack([x, y, z], axis=-1)


class CosmoT2mOperator(BaseOperator):
    """T2m station operator over a stacked (rlat, rlon, vgrid) COSMO state.

    Parameters
    ----------
    station_lat / station_lon / station_alt : [n_station] arrays (deg, deg, m).
    cosmo_lat / cosmo_lon : [rlat, rlon] grid coordinates (deg).
    cosmo_hsurf : [rlat, rlon] surface height (m) — the reference reads HSURF
        from the COSMO constant file (cos_t2m.py:100-104).
    vgrid : [n_vgrid] merged vertical coordinate of the state (from
        :func:`~tpu_assim.models.terrsysmp.preprocess_cosmo`).
    var_names : state variable order; must contain 'T' and 'T_2M'.
    lev_inds : two vgrid indices used for the lapse rate
        (reference default [40, 35], cos_t2m.py:79).
    t2m_level : vgrid value where T_2M lives (0.0 = the no_vgrid slot,
        matching the reference's ``height_lev=0`` in cos_t2m.py:205).
    """

    def __init__(
        self,
        station_lat: np.ndarray,
        station_lon: np.ndarray,
        station_alt: np.ndarray,
        cosmo_lat: np.ndarray,
        cosmo_lon: np.ndarray,
        cosmo_hsurf: np.ndarray,
        vgrid: np.ndarray,
        var_names: Sequence[str],
        lev_inds: Tuple[int, int] = (40, 35),
        t2m_level: float = 0.0,
    ):
        super().__init__(len_grid=int(np.size(cosmo_hsurf)))
        from scipy.spatial import cKDTree

        station_alt = np.asarray(station_alt, dtype=np.float64)
        vgrid = np.asarray(vgrid, dtype=np.float64)
        self.vgrid = vgrid
        self.var_names = tuple(str(v) for v in var_names)
        self.lev_inds = tuple(lev_inds)
        hsurf_flat = np.asarray(cosmo_hsurf, dtype=np.float64).reshape(-1)

        # nearest COSMO column per station, on cartesian coords
        # (reference: cos_t2m.py:116-131, 146-153)
        cosmo_xyz = _get_cartesian(
            np.asarray(cosmo_lat, dtype=np.float64).reshape(-1),
            np.asarray(cosmo_lon, dtype=np.float64).reshape(-1),
            hsurf_flat,
        )
        station_xyz = _get_cartesian(
            np.asarray(station_lat, dtype=np.float64),
            np.asarray(station_lon, dtype=np.float64),
            station_alt,
        )
        tree = cKDTree(cosmo_xyz)
        _, self.locs = tree.query(station_xyz, k=1)  # flat horizontal index

        # height correction (reference: cos_t2m.py:133-144)
        self.height_diff = station_alt - hsurf_flat[self.locs]

        n_vgrid = len(vgrid)
        t2m_ind = int(np.argmin(np.abs(vgrid - t2m_level)))
        # flat gathers into the stacked (rlat, rlon, vgrid) grid (C-order)
        self._t2m_gather = self.locs * n_vgrid + t2m_ind
        self._lev0_gather = self.locs * n_vgrid + self.lev_inds[0]
        self._lev1_gather = self.locs * n_vgrid + self.lev_inds[1]
        self._lapse_h_diff = vgrid[self.lev_inds[1]] - vgrid[self.lev_inds[0]]
        self._i_t = self.var_names.index("T")
        self._i_t2m = self.var_names.index("T_2M")

    def __str__(self) -> str:
        return "COSMO 2-metre-temperature observation operator"

    def get_lapse_rate(self, state_data: jnp.ndarray) -> jnp.ndarray:
        """Model lapse rate between the two configured levels at each
        station's column (reference: cos_t2m.py:179-188).

        state_data [var, time, ens, grid] -> [time, ens, n_station]."""
        temp = state_data[self._i_t]
        temp_1 = jnp.take(temp, jnp.asarray(self._lev1_gather), axis=-1)
        temp_0 = jnp.take(temp, jnp.asarray(self._lev0_gather), axis=-1)
        return (temp_1 - temp_0) / self._lapse_h_diff

    def obs_op(self, in_state: EnsembleState, *args, **kwargs) -> jnp.ndarray:
        """T2m equivalents [time, ens, n_station]
        (reference: cos_t2m.py:196-215)."""
        return self.jax_operator()(in_state.data)

    def jax_operator(self) -> Callable[[jnp.ndarray], jnp.ndarray]:
        """Pure jnp twin: [var, time, ens, grid] -> [time, ens, n_station]."""
        t2m_gather = jnp.asarray(self._t2m_gather)
        h_diff = jnp.asarray(self.height_diff)
        i_t2m = self._i_t2m

        def op(state_data: jnp.ndarray) -> jnp.ndarray:
            uncorr = jnp.take(state_data[i_t2m], t2m_gather, axis=-1)
            lapse = self.get_lapse_rate(state_data)
            return uncorr + h_diff * lapse

        return op
