"""2-D multiroom maze layout: wall geometry, doors, samplers, top-down render.

Reference: gcp/planning/infra/envs/miniworld_env/utils/multiroom2d_layout.py and
sampling_fcns.py. Deterministic generation (MAZE_SEED=42, MULTIMODAL=True)
reproduces the published room/door topology exactly. Rendering uses flat
per-room colors when the dataset texture pack is absent (the reference loads
textures shipped with the nav datasets).
"""
from __future__ import annotations

import os
import queue
from random import Random

import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

ROBOT_SIZE = 0.02
ROOM_SIZE = 1 / 3
DOOR_SIZE = 1.5 * 0.0667

MAZE_SEED = 42
MULTIMODAL = True
NON_SYMMETRIC = False


def define_layout_raw(rooms_per_side, _add_horizontal_line=None,
                      _add_vertical_line=None):
    """Wall segment point clouds + door list (multiroom2d_layout.py:20-78)."""
    if _add_vertical_line is None:
        coord_offset = 0.5 * rooms_per_side * ROOM_SIZE

        def _add_horizontal_line(x_range, y):
            ox = np.linspace(x_range[0], x_range[1],
                             int((x_range[1] - x_range[0] + 1) * 100))
            oy = y * np.ones_like(ox)
            return np.stack([ox, oy], axis=0) - coord_offset

        def _add_vertical_line(y_range, x):
            oy = np.linspace(y_range[0], y_range[1],
                             int((y_range[1] - y_range[0] + 1) * 100))
            ox = x * np.ones_like(oy)
            return np.stack([ox, oy], axis=0) - coord_offset

    table_size = ROOM_SIZE * rooms_per_side
    o = _add_horizontal_line([0, table_size], 0)
    o = np.concatenate((o, _add_horizontal_line([0, table_size], table_size)), axis=1)
    o = np.concatenate((o, _add_vertical_line([0, table_size], 0)), axis=1)
    o = np.concatenate((o, _add_vertical_line([0, table_size], table_size)), axis=1)

    rng = Random()
    rng.seed(MAZE_SEED)
    for wall_add_fcn in [_add_horizontal_line, _add_vertical_line]:
        for r in range(rooms_per_side):
            o = np.concatenate(
                (o, wall_add_fcn([0, ROOM_SIZE / 2 - DOOR_SIZE / 2],
                                 (r + 1) * ROOM_SIZE)), axis=1)
            for seg_idx in range(rooms_per_side - 1):
                if NON_SYMMETRIC and rng.random() < 0.1:
                    continue
                o = np.concatenate(
                    (o, wall_add_fcn(
                        [(2 * seg_idx + 1) * ROOM_SIZE / 2 + DOOR_SIZE / 2,
                         (2 * (seg_idx + 1) + 1) * ROOM_SIZE / 2 - DOOR_SIZE / 2],
                        (r + 1) * ROOM_SIZE)), axis=1)
            o = np.concatenate(
                (o, wall_add_fcn(
                    [(rooms_per_side - 0.5) * ROOM_SIZE + DOOR_SIZE / 2,
                     rooms_per_side * ROOM_SIZE],
                    (r + 1) * ROOM_SIZE)), axis=1)

    doors = gen_doors_multimodal(rooms_per_side) if MULTIMODAL \
        else generate_maze(rooms_per_side)
    for rx in range(rooms_per_side):
        for ry in range(rooms_per_side):
            if rx + 1 < rooms_per_side and (
                ((rx, ry), (rx + 1, ry)) not in doors
                and ((rx + 1, ry), (rx, ry)) not in doors
            ):
                door_center = ROOM_SIZE / 2 + ry * ROOM_SIZE
                o = np.concatenate(
                    (o, _add_vertical_line(
                        [door_center - DOOR_SIZE / 2, door_center + DOOR_SIZE / 2],
                        (rx + 1) * ROOM_SIZE)), axis=1)
            if ry + 1 < rooms_per_side and (
                ((rx, ry), (rx, ry + 1)) not in doors
                and ((rx, ry + 1), (rx, ry)) not in doors
            ):
                door_center = ROOM_SIZE / 2 + rx * ROOM_SIZE
                o = np.concatenate(
                    (o, _add_horizontal_line(
                        [door_center - DOOR_SIZE / 2, door_center + DOOR_SIZE / 2],
                        (ry + 1) * ROOM_SIZE)), axis=1)

    def coords2ridx(x, y):
        return x * rooms_per_side + (rooms_per_side - 1) - y

    doors = [sorted((coords2ridx(*d[0]), coords2ridx(*d[1]))) for d in doors]
    return o, ROBOT_SIZE, table_size, doors


def generate_maze(rooms_per_side):
    """Depth-first maze without shortcuts (multiroom2d_layout.py:84-105)."""
    doors = []
    rng = Random()
    rng.seed(MAZE_SEED)
    visited = []
    neighbors = [(0, 1), (1, 0), (-1, 0), (0, -1)]

    def visit(x, y):
        visited.append((x, y))
        rng.shuffle(neighbors)
        for dx, dy in neighbors.copy():
            nx, ny = x + dx, y + dy
            if nx < 0 or nx >= rooms_per_side or ny < 0 or ny >= rooms_per_side:
                continue
            if (nx, ny) in visited:
                continue
            doors.append(((x, y), (nx, ny)))
            visit(nx, ny)

    visit(0, 0)
    return doors


def gen_doors_multimodal(rooms_per_side):
    """Open layout with selected walls removed (multiroom2d_layout.py:108-155)."""
    doors = []
    neighbors = [(0, 1), (1, 0), (-1, 0), (0, -1)]

    def add_doors(x, y):
        for dx, dy in neighbors.copy():
            nx, ny = x + dx, y + dy
            if nx < 0 or nx >= rooms_per_side or ny < 0 or ny >= rooms_per_side:
                continue
            if ((x, y), (nx, ny)) in doors or ((nx, ny), (x, y)) in doors:
                continue
            doors.append(((x, y), (nx, ny)))
            add_doors(nx, ny)

    add_doors(0, 0)

    def maybe_remove(r1, r2):
        if (r1, r2) in doors:
            doors.remove((r1, r2))
        elif (r2, r1) in doors:
            doors.remove((r2, r1))

    if rooms_per_side == 3:
        maybe_remove((1, 1), (1, 2))
        maybe_remove((1, 1), (1, 0))
    elif rooms_per_side == 4:
        for pair in [((0, 3), (1, 3)), ((1, 0), (2, 0)), ((2, 1), (3, 1)),
                     ((2, 2), (3, 2)), ((2, 3), (3, 3)), ((1, 3), (1, 4))]:
            maybe_remove(*pair)
    elif rooms_per_side == 5:
        for pair in [((0, 3), (1, 3)), ((1, 0), (2, 0)), ((2, 1), (3, 1)),
                     ((2, 2), (3, 2)), ((2, 3), (3, 3)), ((1, 3), (1, 4)),
                     ((1, 1), (1, 2)), ((2, 1), (2, 2)), ((3, 1), (3, 2)),
                     ((4, 2), (4, 3))]:
            maybe_remove(*pair)
    else:
        raise NotImplementedError
    return doors


def define_layout(rooms_per_side, texture_dir=None) -> AttrDict:
    o, robot_size, table_size, doors = define_layout_raw(rooms_per_side)
    ox, oy = list(o[0]), list(o[1])

    def coords2ridx(x, y):
        xy_room = [np.floor((c + table_size / 2) / ROOM_SIZE) for c in [x, y]]
        ridx = xy_room[0] * rooms_per_side + (rooms_per_side - 1) - xy_room[1]
        return int(ridx) if np.size(ridx) == 1 else np.asarray(ridx, dtype=int)

    return AttrDict(
        ox=ox, oy=oy, robot_size=robot_size, table_size=table_size,
        room_size=ROOM_SIZE, door_size=DOOR_SIZE, doors=doors,
        coords2ridx=coords2ridx, textures=None, texture_dir=texture_dir,
        multimodal=MULTIMODAL, non_symmetric=NON_SYMMETRIC,
    )


_ROOM_COLORS = None


def _room_colors(n):
    global _ROOM_COLORS
    rng = np.random.RandomState(7)
    colors = 0.35 + 0.55 * rng.rand(n, 3)
    return colors


def draw_layout_overview(rooms_per_side, render_scale, texture_dir=None,
                         add_textures=True):
    """Static top-down maze image (multiroom2d_layout.py:265-296).

    Rooms get distinct flat colors (deterministic) when no texture pack is
    available, so frames remain visually distinguishable for the predictor.
    """
    layout = define_layout(rooms_per_side, texture_dir)
    res = int(layout.table_size * render_scale)
    room_px = int(res / rooms_per_side)
    img = np.ones((res, res, 3), dtype=np.float32)
    colors = _room_colors(rooms_per_side ** 2)
    for x in range(rooms_per_side):
        for y in range(rooms_per_side):
            img[y * room_px : (y + 1) * room_px,
                x * room_px : (x + 1) * room_px] = colors[x * rooms_per_side + y]

    def _add_horizontal_line(x_range, y):
        cv2.line(img, (int(x_range[0] * render_scale), res - int(y * render_scale - 1)),
                 (int(x_range[1] * render_scale), res - int(y * render_scale - 1)),
                 (0, 0, 0), 3)
        return np.zeros((2, 1))

    def _add_vertical_line(y_range, x):
        cv2.line(img, (int(x * render_scale), res - int(y_range[0] * render_scale - 1)),
                 (int(x * render_scale), res - int(y_range[1] * render_scale - 1)),
                 (0, 0, 0), 3)
        return np.zeros((2, 1))

    define_layout_raw(rooms_per_side, _add_horizontal_line, _add_vertical_line)
    return img


# ---------------------------------------------------------------------------
# state sampling (sampling_fcns.py:13-93)
# ---------------------------------------------------------------------------


def _rand(n):
    return np.random.rand(n) - 0.5


class RoomSampler2d:
    """Uniform room / door state sampling."""

    def __init__(self, rooms_per_side, sample_wide=False):
        self._rooms_per_side = rooms_per_side
        self._agent_size = 0.02
        self._sampling_width = 1 / 3 - (not sample_wide) * 3 * self._agent_size
        self._room_offset = 1 / 3
        self._door_sampling_width = 1.5 * 0.0667 - 3 * self._agent_size
        self._hor_door_sampling_width = np.array(
            [2 * self._agent_size, self._door_sampling_width]
        )
        self._vert_door_sampling_width = np.array(
            [self._door_sampling_width, 2 * self._agent_size]
        )

    def sample(self, room=None):
        if room is None:
            room = np.random.randint(self._rooms_per_side ** 2)
        room = self._ridx2coords(room)
        center = np.array(
            [self._room_offset / 2 + i * self._room_offset
             - self._rooms_per_side / 2 * self._room_offset for i in room]
        )
        return _rand(2) * self._sampling_width + center

    def sample_door(self, room1, room2, sample_center=False):
        center = self.get_door_pos(room1, room2)
        if sample_center:
            return center
        r1, r2 = self._ridx2coords(room1), self._ridx2coords(room2)
        if r1[0] != r2[0] and r1[1] == r2[1]:
            return _rand(2) * self._hor_door_sampling_width + center
        if r1[0] == r2[0] and r1[1] != r2[1]:
            return _rand(2) * self._vert_door_sampling_width + center
        raise ValueError("Rooms don't have connection for door.")

    def get_door_pos(self, room1, room2):
        assert room1 < room2
        r1, r2 = self._ridx2coords(room1), self._ridx2coords(room2)
        assert abs(r1[0] - r2[0] + r1[1] - r2[1]) == 1
        return np.array(
            [self._room_offset / 2 + (i + j) / 2 * self._room_offset
             - self._rooms_per_side / 2 * self._room_offset
             for i, j in zip(r1, r2)]
        )

    def get_door_path(self, room1, room2):
        lefttop = room1 < room2
        center = self.get_door_pos(min(room1, room2), max(room1, room2))
        r1, r2 = self._ridx2coords(room1), self._ridx2coords(room2)
        if r1[0] != r2[0] and r1[1] == r2[1]:
            offset = np.array([3 * self._door_sampling_width, 0])
        elif r1[0] == r2[0] and r1[1] != r2[1]:
            offset = np.array([0, -3 * self._door_sampling_width])
        else:
            raise ValueError("Rooms don't have connection for door.")
        if lefttop:
            return [center - offset, center, center + offset]
        return [center + offset, center, center - offset]

    def _ridx2coords(self, room_idx):
        return (
            int(np.floor(room_idx / self._rooms_per_side)),
            int(self._rooms_per_side - 1 - room_idx % self._rooms_per_side),
        )


# ---------------------------------------------------------------------------
# room-sequence planning (prm_policy.py:228-289)
# ---------------------------------------------------------------------------


def plan_room_seq(start, goal, doors):
    """Breadth-first room search."""
    frontier = queue.Queue()
    visited = []

    def expand(node):
        if node["room"] == goal:
            return node
        visited.append(node["room"])
        neighbors = []
        for d in doors:
            if d[0] == node["room"] and d[1] not in visited:
                neighbors.append(d[1])
            elif d[1] == node["room"] and d[0] not in visited:
                neighbors.append(d[0])
        for n in neighbors:
            frontier.put(dict(room=n, parent=node))
        return expand(frontier.get())

    linked = expand(dict(room=start, parent=None))
    path = []
    while linked is not None:
        path.append(linked["room"])
        linked = linked["parent"]
    return path[::-1]


def plan_room_seq_multimodal(start, goal, doors):
    """All simple paths; returns one at random (prm_policy.py:257-289)."""
    frontier = queue.Queue()
    goal_nodes = []

    def collect_path(node):
        path = []
        while node is not None:
            path.append(node["room"])
            node = node["parent"]
        return path

    def expand(node):
        if node["room"] == goal:
            goal_nodes.append(node)
        else:
            for d in doors:
                if d[0] == node["room"] and d[1] not in collect_path(node):
                    frontier.put(dict(room=d[1], parent=node))
                elif d[1] == node["room"] and d[0] not in collect_path(node):
                    frontier.put(dict(room=d[0], parent=node))
        if frontier.empty():
            return
        expand(frontier.get())

    expand(dict(room=start, parent=None))
    chosen = goal_nodes[np.random.randint(len(goal_nodes))]
    return collect_path(chosen)[::-1]


def render_state_trajectories(n_rooms, inputs, predictions, end_inds,
                              n_logged_samples=3):
    """Top-down GT (green) + predicted (red) trajectory overlays for logging
    (datasets/configs/nav_9rooms.py:12-53)."""
    from video_gcp_tpu.planning.infra.envs.multiroom2d import Multiroom2dEnv

    env = Multiroom2dEnv(dict(n_rooms=n_rooms), no_env=True)
    imgs = []
    for i in range(min(n_logged_samples, len(end_inds))):
        e = int(end_inds[i])
        gt = np.asarray(inputs.traj_seq_states[i][: e + 1])
        pred = np.asarray(predictions[i][: e + 1])
        bg = env.render_top_down(gt, color=(0, 1.0, 0))
        imgs.append(env.render_top_down(pred, background=bg, color=(1.0, 0, 0)))
    return np.stack(imgs)
