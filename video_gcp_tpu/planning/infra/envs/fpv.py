"""First-person (egocentric) rendering of the multiroom maze.

The reference's 3-D observation mode comes from gym-miniworld — an external
OpenGL dependency whose submodule ships empty
(gcp/planning/infra/envs/miniworld_env/multiroom3d/multiroom3d_env.py:40-62
builds `MiniWorldEnv` with obs_height/obs_width; README "3D Navigation").
Here the same capability is a self-contained, dependency-free column
raycaster over the maze's exact wall-segment table
(layout.wall_segments): vectorized ray/segment intersection per image
column, perspective wall slices, per-room wall colors, floor/ceiling
shading, and a distance-scaled goal billboard — everything a
goal-conditioned egocentric predictor needs, with no GPU/GL stack.

Geometry lives in the same centered table coordinates the env uses
(origin at the maze center, table spans [-table/2, table/2]^2).
"""
from __future__ import annotations

import numpy as np

from video_gcp_tpu.planning.infra.envs.layout import (
    ROOM_SIZE,
    _flat_room_colors,
    wall_segments,
)


class FirstPersonRenderer:
    """Raycast renderer for one maze layout.

    :param rooms_per_side: maze side length in rooms (3 for nav_9rooms).
    :param img_size: square output resolution.
    :param fov: horizontal field of view in radians.
    """

    # world units; camera sits at half height. Rooms are only ROOM_SIZE
    # across, so a low wall keeps floor/ceiling visible from mid-room
    WALL_HEIGHT = 0.25 * ROOM_SIZE
    FLOOR_COLOR = np.array([0.22, 0.20, 0.18], np.float32)
    CEIL_COLOR = np.array([0.55, 0.60, 0.68], np.float32)
    GOAL_COLOR = np.array([0.95, 0.15, 0.10], np.float32)

    def __init__(self, rooms_per_side: int, img_size: int = 64,
                 fov: float = np.pi / 3):
        self.rooms_per_side = rooms_per_side
        self.img_size = img_size
        self.fov = fov
        table = ROOM_SIZE * rooms_per_side
        segs, _ = wall_segments(rooms_per_side)
        segs = np.asarray(segs, np.float64) - table / 2  # centered coords
        self._a = segs[:, 0:2]  # [S, 2] segment starts
        self._e = segs[:, 2:4] - segs[:, 0:2]  # [S, 2] segment extents
        self._half_table = table / 2
        self._colors = _flat_room_colors(rooms_per_side * rooms_per_side)
        # horizontal walls get a 20% darker shade than vertical ones — the
        # classic raycaster depth cue that disambiguates wall orientation
        self._orient_shade = np.where(
            np.abs(self._e[:, 1]) < 1e-12, 0.8, 1.0)
        # camera-plane offsets: linear in the projection plane (not in
        # angle), so vertical lines stay straight
        w = img_size
        self._plane = np.linspace(-1.0, 1.0, w) * np.tan(fov / 2)
        self._proj_dist = 1.0  # distances are normalized to the plane below

    def _room_color(self, pts: np.ndarray) -> np.ndarray:
        """Flat wall color of the room each point [N, 2] lies in."""
        cell = np.floor(
            (pts + self._half_table) / ROOM_SIZE).astype(int)
        cell = np.clip(cell, 0, self.rooms_per_side - 1)
        ridx = cell[:, 0] * self.rooms_per_side + (
            self.rooms_per_side - 1 - cell[:, 1])
        return self._colors[ridx]

    def cast(self, pos, heading):
        """Perpendicular wall distance + hit info for every image column.

        :return: (perp [W], hit_pts [W, 2], seg_idx [W]) — perp is the
            fisheye-corrected distance used for projection.
        """
        pos = np.asarray(pos, np.float64)
        fwd = np.array([np.cos(heading), np.sin(heading)])
        right = np.array([fwd[1], -fwd[0]])
        # one ray per column through the camera plane
        dirs = fwd[None, :] + self._plane[:, None] * right[None, :]  # [W, 2]

        ap = self._a[None, :, :] - pos[None, None, :]  # [1, S, 2]
        e = self._e[None, :, :]
        denom = dirs[:, None, 0] * e[..., 1] - dirs[:, None, 1] * e[..., 0]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (ap[..., 0] * e[..., 1] - ap[..., 1] * e[..., 0]) / denom
            s = (ap[..., 0] * dirs[:, None, 1]
                 - ap[..., 1] * dirs[:, None, 0]) / denom
        valid = (np.abs(denom) > 1e-12) & (t > 1e-6) & (s >= 0.0) & (s <= 1.0)
        t = np.where(valid, t, np.inf)
        seg_idx = np.argmin(t, axis=1)  # [W]
        t_hit = t[np.arange(t.shape[0]), seg_idx]
        t_hit = np.where(np.isfinite(t_hit), t_hit, 10.0 * self._half_table)
        hit_pts = pos[None, :] + dirs * t_hit[:, None]
        # dirs are camera-plane rays (|dir| != 1): t is already the
        # perpendicular (projection-plane) depth — no cos correction needed
        return t_hit, hit_pts, seg_idx

    def render(self, pos, heading, goal=None) -> np.ndarray:
        """Egocentric RGB frame, uint8 [img_size, img_size, 3]."""
        h = w = self.img_size
        perp, hit_pts, seg_idx = self.cast(pos, heading)

        # inward nudge so the hit point's room lookup lands on the camera
        # side of the wall
        pos_np = np.asarray(pos, np.float64)
        inward = pos_np[None, :] - hit_pts
        inward /= np.linalg.norm(inward, axis=1, keepdims=True) + 1e-12
        base = self._room_color(hit_pts + 1e-4 * inward)  # [W, 3]
        shade = self._orient_shade[seg_idx, None] / (1.0 + 2.5 * perp[:, None])
        wall_col = np.clip(base * (0.35 + 0.65 * shade), 0.0, 1.0)

        # perspective wall slice per column
        half_h = (self.WALL_HEIGHT / 2) / np.maximum(perp, 1e-4) * (
            (h / 2) / np.tan(self.fov / 2))
        top = np.clip(np.round(h / 2 - half_h).astype(int), 0, h)
        bot = np.clip(np.round(h / 2 + half_h).astype(int), 0, h)

        img = np.empty((h, w, 3), np.float32)
        rows = np.arange(h)[:, None]
        ceil_mask = rows < top[None, :]
        floor_mask = rows >= bot[None, :]
        # mild vertical gradient on floor/ceiling for a horizon cue
        grad = np.abs(rows - h / 2) / (h / 2)
        img[:] = self.CEIL_COLOR * (0.7 + 0.3 * grad)
        img = np.where(floor_mask[..., None],
                       self.FLOOR_COLOR * (0.5 + 0.5 * grad), img)
        wall_mask = ~ceil_mask & ~floor_mask
        img = np.where(wall_mask[..., None],
                       np.broadcast_to(wall_col[None], (h, w, 3)), img)

        if goal is not None:
            img = self._draw_goal(img, pos_np, heading, np.asarray(goal),
                                  perp)
        return (img * 255).astype(np.uint8)

    def _draw_goal(self, img, pos, heading, goal, perp):
        """Distance-scaled goal billboard (miniworld's goal box analogue),
        occluded by walls."""
        h = w = self.img_size
        rel = goal - pos
        dist = np.linalg.norm(rel)
        if dist < 1e-6:
            return img
        fwd = np.array([np.cos(heading), np.sin(heading)])
        right = np.array([fwd[1], -fwd[0]])
        depth = rel @ fwd
        if depth < 1e-3:
            return img  # behind the camera
        lateral = (rel @ right) / depth  # camera-plane coordinate
        col_f = (lateral / np.tan(self.fov / 2) + 1.0) / 2.0 * (w - 1)
        proj = (h / 2) / np.tan(self.fov / 2)
        size = int(np.clip(0.35 * self.WALL_HEIGHT / depth * proj, 1, h // 2))
        c0 = int(round(col_f)) - size // 2
        cols = np.arange(max(c0, 0), min(c0 + size, w))
        if cols.size == 0:
            return img
        visible = cols[perp[cols] > depth]  # wall occlusion per column
        if visible.size == 0:
            return img
        r0 = h // 2  # goal sits on the floor: from mid-screen downward
        r1 = min(r0 + size, h)
        img[r0:r1, visible] = self.GOAL_COLOR
        return img
