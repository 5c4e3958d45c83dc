"""PRM expert policy for maze navigation data generation.

Reference: gcp/planning/infra/policy/prm_policy/prm_policy.py:12-298.
BFS room-sequence planning -> per-room/door PRM sampling -> Dijkstra ->
spline-smoothed state plan -> delta-state actions, with replanning on
deviation and fallback plans after repeated failures (SURVEY.md §5.3 failure
handling).
"""
from __future__ import annotations

import numpy as np
from scipy import interpolate

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.params import ParamDict
from video_gcp_tpu.planning.infra.envs.layout import (
    RoomSampler2d,
    define_layout,
    plan_room_seq,
    plan_room_seq_multimodal,
)
from video_gcp_tpu.planning.infra.policy.policy import Policy
from video_gcp_tpu.planning.infra.policy.prm_policy.prm import PRM_planning


class PrmPolicy(Policy):
    VAR_SAMPLING_RATES = [30, 300]

    def __init__(self, ag_params, policyparams, gpu_id=None, ngpu=None,
                 conversion_fcns=None, n_rooms=None):
        super().__init__()
        policyparams = dict(policyparams)
        policyparams["n_rooms"] = n_rooms
        self.override_defaults(policyparams)

        self._rooms_per_side = int(np.sqrt(self._hp.n_rooms))
        self.layout = define_layout(self._rooms_per_side)
        self.state_sampler = RoomSampler2d(
            self._rooms_per_side, sample_wide=self.layout.non_symmetric
        )
        self.plan_params = dict(
            n_knn=self._hp.n_knn,
            max_edge_len=self._hp.max_edge_len,
            cost_fcn=lambda d: d ** self._hp.cost_power,
        )
        self.current_action = None
        self.state_plan = None
        self.action_plan = None
        self.convert = conversion_fcns
        self._room_plan = None

    def reset(self):
        self.current_action = None
        self.state_plan = None
        self.action_plan = None
        self._room_plan = None

    def _default_hparams(self):
        p = super()._default_hparams()
        p.update(dict(
            n_samples_per_room=50,
            n_samples_per_door=3,
            n_knn=10,
            max_edge_len=0.1,
            replan_eps=0.05,
            max_planning_retries=2,
            cost_power=2,
            bottleneck_sampling=True,
            use_var_sampling=False,
            subsample_factor=1.0,
            max_traj_length=None,
            smooth_trajectory=False,
            sample_door_center=False,
            use_scripted_path=False,
            straight_through_door=False,
            n_rooms=None,
            use_fallback_plan=True,
            logger=None,
        ))
        return p

    # ------------------------------------------------------------------

    def act(self, t=None, i_tr=None, qpos_full=None, goal=None):
        self.i_tr = i_tr
        output = AttrDict()
        if self.action_plan is None or self._check_deviate(
            qpos_full[t, :2],
            self.state_plan[:, min(self.current_action,
                                   self.state_plan.shape[1] - 1)],
        ):
            self._plan(qpos_full[t], goal[t], t)
            self.current_action = 0

        done = False
        if self.current_action < self.action_plan.shape[1]:
            output.actions = self.action_plan[:, self.current_action]
        else:
            done = True
            output.actions = np.zeros(2)
        self.current_action += 1
        output.done = done
        return output

    def _check_deviate(self, pos, target_pos):
        return np.linalg.norm(pos - target_pos) > self._hp.replan_eps

    # ------------------------------------------------------------------

    def _sample_per_room(self, room_path):
        px, py = [], []
        room_path = range(self._hp.n_rooms) if room_path is None else room_path
        for room in room_path:
            n = (int(np.random.choice(self.VAR_SAMPLING_RATES))
                 if self._hp.use_var_sampling else self._hp.n_samples_per_room)
            for _ in range(n):
                p = self.state_sampler.sample(room)
                px.append(p[0])
                py.append(p[1])
        return px, py

    def _sample_per_door(self, room_path=None):
        doors = self.layout.doors if room_path is None else [
            (min(room_path[i], room_path[i + 1]),
             max(room_path[i], room_path[i + 1]))
            for i in range(len(room_path) - 1)
        ]
        if not doors:
            return [], []
        samples = np.asarray([
            [self.state_sampler.sample_door(d[0], d[1],
                                            self._hp.sample_door_center)
             for _ in range(self._hp.n_samples_per_door)]
            for d in doors
        ]).transpose(2, 0, 1).reshape(2, -1)
        return list(samples[0]), list(samples[1])

    def _sample_points(self, room_path=None):
        px, py = self._sample_per_room(room_path)
        if self._hp.bottleneck_sampling:
            dx, dy = self._sample_per_door(room_path)
            px.extend(dx)
            py.extend(dy)
        return [px, py]

    # ------------------------------------------------------------------

    def _plan(self, agent_pos, goal_pos, t):
        if self.convert is not None:
            pos = self.convert.env2prm(agent_pos[:2])
            goal_pos = self.convert.env2prm(goal_pos)
        else:
            pos = agent_pos[:2]

        length, path = self.compute_shortest_path(pos, goal_pos,
                                                  transform_pose=False)
        if self._hp.use_scripted_path:
            planned_x = [p[0] for p in path]
            planned_y = [p[1] for p in path]
            success = True
        else:
            sx, sy = pos[0], pos[1]
            gx, gy = goal_pos[0], goal_pos[1]
            ox, oy = self.layout.ox, self.layout.oy
            if self._room_plan is None:
                room_path = self.plan_room_seq(
                    self.layout.coords2ridx(*pos),
                    self.layout.coords2ridx(*goal_pos),
                    self.layout.doors,
                )
                self._room_plan = room_path
            else:
                room_path = self._room_plan

            success = False
            planned_x, planned_y = [], []
            for _ in range(self._hp.max_planning_retries):
                pts = self._sample_points(room_path)
                planned_x, planned_y, success = PRM_planning(
                    sx, sy, gx, gy, ox, oy, self.layout.robot_size,
                    self.plan_params,
                    self._hp.n_samples_per_room * self._hp.n_rooms, pts,
                )
                if success:
                    break

        if not success:
            if self._hp.use_fallback_plan:
                self._fallback_plan()
            return None, False

        n_steps = int(length * 20)
        if self._hp.max_traj_length is not None:
            n_steps = min(n_steps, self._hp.max_traj_length - t)
        n_steps = max(n_steps, 2)
        try:
            tck, _ = interpolate.splprep([planned_x, planned_y], s=0.0)
            x_i, y_i = interpolate.splev(np.linspace(0, 1, n_steps), tck)
            self.state_plan = np.stack((x_i, y_i))
        except (TypeError, ValueError):
            # duplicate points break the spline fit (prm_policy.py:185-189)
            self._fallback_plan()
            return None, False
        self.action_plan = self.state_plan[:, 1:] - self.state_plan[:, :-1]

        raw_plan = self.state_plan.copy()
        if self.convert is not None:
            self.state_plan, self.action_plan = self.convert.transform_plan(
                self.state_plan, self.action_plan
            )
        return raw_plan, True

    def _fallback_plan(self):
        """Reverse recent actions / random nudge (prm_policy.py:192-196)."""
        if self.action_plan is not None:
            self.action_plan = -2 * self.action_plan[
                :, max(self.current_action - 1, 0):
            ]
            if self.action_plan.shape[1] == 0:
                self.action_plan = self.state_plan = 0.02 * np.random.rand(2, 1)
        else:
            self.action_plan = self.state_plan = 0.02 * np.random.rand(2, 1)

    def compute_shortest_path(self, p1, p2, transform_pose=True,
                              straight_through_door=False):
        """Waypoint path through door centers + its length
        (prm_policy.py:198-216)."""
        if self.convert is not None and transform_pose:
            p1, p2 = self.convert.env2prm(p1), self.convert.env2prm(p2)
        if (np.stack((p1, p2)) < -0.5).any() or (np.stack((p1, p2)) > 0.5).any():
            return 10.0, []
        room_path = plan_room_seq(
            self.layout.coords2ridx(p1[0], p1[1]),
            self.layout.coords2ridx(p2[0], p2[1]),
            self.layout.doors,
        )
        waypoints = [np.asarray(p1)]
        for n in range(len(room_path) - 1):
            if straight_through_door:
                waypoints.extend(self.state_sampler.get_door_path(
                    room_path[n], room_path[n + 1]))
            else:
                waypoints.append(self.state_sampler.get_door_pos(
                    min(room_path[n], room_path[n + 1]),
                    max(room_path[n], room_path[n + 1]),
                ))
        waypoints.append(np.asarray(p2))
        waypoints = np.array(waypoints)
        length = np.linalg.norm(waypoints[1:] - waypoints[:-1], axis=1).sum()
        return length, waypoints

    def plan_room_seq(self, *args, **kwargs):
        if self.layout.multimodal:
            return plan_room_seq_multimodal(*args, **kwargs)
        return plan_room_seq(*args, **kwargs)
