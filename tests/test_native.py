"""Tests for the native C++ components: UDP robot interface with safety
clamp (against a loopback robot simulator) and the threaded batch gather."""

import ctypes
import socket
import struct
import threading
import time

import numpy as np
import pytest

from daydreamer_tpu.native import load


def free_port():
  with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
    s.bind(('', 0))
    return s.getsockname()[1]


class LoopbackRobot(threading.Thread):
  """Python UDP endpoint speaking the framework's A1 wire format: echoes
  an observation for every received command, reporting the commanded
  positions back as joint positions."""

  def __init__(self, port, reply_port):
    super().__init__(daemon=True)
    self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    self.sock.bind(('127.0.0.1', port))
    self.sock.settimeout(2.0)
    self.reply = ('127.0.0.1', reply_port)
    self.commands = []
    self.running = True

  def run(self):
    while self.running:
      try:
        data, addr = self.sock.recvfrom(2048)
      except socket.timeout:
        return
      tag, = struct.unpack('<I', data[:4])
      assert tag == 0x43314131  # 'C1A1'
      cmd = np.frombuffer(data[4:], np.float32).reshape(12, 5)
      self.commands.append(cmd.copy())
      obs = np.zeros(50, np.float32)
      obs[:12] = cmd[:, 0]  # Echo commanded positions as joint positions.
      obs[36] = 1.0  # Unit quaternion w.
      packet = struct.pack('<I', 0x4F314131) + obs.tobytes()
      self.sock.sendto(packet, self.reply)


class TestRobotInterface:

  def test_roundtrip_and_safety_clamp(self):
    lib = load('robot_interface')
    local = free_port()
    remote = free_port()
    robot = LoopbackRobot(remote, local)
    robot.start()
    handle = lib.a1_create(b'127.0.0.1', local, remote, 500)
    assert handle
    # Command with out-of-limit positions and torques.
    cmd = np.zeros((12, 5), np.float32)
    cmd[:, 0] = 10.0   # Far beyond joint limits.
    cmd[:, 4] = 100.0  # Beyond torque limit.
    buf = (ctypes.c_float * 60)(*cmd.reshape(-1))
    assert lib.a1_send_command(handle, buf) > 0
    obs = (ctypes.c_float * 50)()
    ret = lib.a1_receive_observation(handle, obs)
    assert ret == 1
    received = np.ctypeslib.as_array(obs)
    # The robot saw CLAMPED positions: hip <= 0.802, thigh <= 4.19.
    assert received[0] <= 0.81
    assert received[1] <= 4.20
    time.sleep(0.1)
    assert len(robot.commands) == 1
    sent_cmd = robot.commands[0]
    assert (np.abs(sent_cmd[:, 4]) <= 33.6).all()  # Torque clamped.
    sent = ctypes.c_uint64()
    recv = ctypes.c_uint64()
    clamped = ctypes.c_uint64()
    lib.a1_stats(handle, ctypes.byref(sent), ctypes.byref(recv),
                 ctypes.byref(clamped))
    assert sent.value == 1 and recv.value == 1 and clamped.value > 0
    lib.a1_destroy(handle)
    robot.running = False

  def test_nonfinite_commands_neutralized(self):
    lib = load('robot_interface')
    local = free_port()
    remote = free_port()
    handle = lib.a1_create(b'127.0.0.1', local, remote, 50)
    cmd = np.zeros((12, 5), np.float32)
    cmd[0, 0] = np.nan
    cmd[0, 2] = 50.0
    cmd[0, 4] = 10.0
    buf = (ctypes.c_float * 60)(*cmd.reshape(-1))
    lib.a1_safety_clamp(handle, buf)
    out = np.ctypeslib.as_array(buf).reshape(12, 5)
    assert out[0, 2] == 0.0  # kp zeroed for non-finite command.
    assert out[0, 4] == 0.0  # torque zeroed.
    lib.a1_destroy(handle)

  def test_receive_timeout(self):
    lib = load('robot_interface')
    handle = lib.a1_create(b'127.0.0.1', free_port(), free_port(), 50)
    obs = (ctypes.c_float * 50)()
    assert lib.a1_receive_observation(handle, obs) == 0  # Timeout.
    lib.a1_destroy(handle)


class TestFastCopy:

  def test_gather_matches_numpy(self):
    lib = load('fastcopy')
    rng = np.random.RandomState(0)
    sources = [np.ascontiguousarray(rng.rand(16, 7).astype(np.float32))
               for _ in range(8)]
    out = np.empty((8, 4, 7), np.float32)
    srcs, offs, sizes = [], [], []
    starts = [rng.randint(0, 12) for _ in range(8)]
    row = 4 * 7 * 4
    for i, (src, start) in enumerate(zip(sources, starts)):
      window = src[start:start + 4]
      srcs.append(window.ctypes.data)
      offs.append(out.ctypes.data + i * row)
      sizes.append(row)
    n = len(srcs)
    lib.fast_gather(
        (ctypes.c_char_p * n)(*[ctypes.cast(s, ctypes.c_char_p)
                                for s in srcs]),
        (ctypes.c_int64 * n)(*offs),
        (ctypes.c_int64 * n)(*sizes),
        n, ctypes.c_char_p(0), 4)
    expected = np.stack(
        [src[start:start + 4] for src, start in zip(sources, starts)])
    assert np.array_equal(out, expected)


class TestNativeBatcher:

  def test_batches_match_store(self):
    from daydreamer_tpu import replay as replaylib
    from daydreamer_tpu.replay.batcher import NativeBatcher
    store = replaylib.RAMStore()
    replay = replaylib.FixedLength(store, chunk=4)
    for _ in range(3):
      for t in range(10):
        replay.add({
            'action': np.full(2, t, np.float32),
            'reward': np.float32(t),
            'is_first': t == 0,
            'is_last': t == 9,
            'is_terminal': False,
        })
    batcher = NativeBatcher(replay, batch_size=6)
    batch = next(batcher)
    assert batch['action'].shape == (6, 4, 2)
    assert batch['is_first'][:, 0].all()
    # Rows must be consistent windows: action[t] == reward[t].
    assert np.array_equal(
        batch['action'][..., 0], batch['reward'])


class TestQPSolver:

  def test_unconstrained_solution(self):
    from daydreamer_tpu.native.qp import solve_box_qp
    P = np.diag([2.0, 4.0])
    q = np.array([-2.0, -8.0])
    x, iters = solve_box_qp(P, q, [-10, -10], [10, 10])
    # Minimum of 0.5 x'Px + q'x at P^-1 (-q) = [1, 2].
    assert np.allclose(x, [1.0, 2.0], atol=1e-3), x

  def test_active_box_constraint(self):
    from daydreamer_tpu.native.qp import solve_box_qp
    P = np.eye(3)
    q = np.array([-5.0, 0.0, 5.0])
    x, iters = solve_box_qp(P, q, [-1, -1, -1], [1, 1, 1])
    assert np.allclose(x, [1.0, 0.0, -1.0], atol=1e-3), x

  def test_coupled_problem_matches_projection(self):
    from daydreamer_tpu.native.qp import solve_box_qp
    rng = np.random.RandomState(0)
    A = rng.randn(5, 5)
    P = A @ A.T + np.eye(5)
    q = rng.randn(5)
    x, iters = solve_box_qp(P, q, [-0.5] * 5, [0.5] * 5)
    # KKT check: gradient must point outward only at active bounds.
    grad = P @ x + q
    for i in range(5):
      if abs(x[i]) < 0.499:
        assert abs(grad[i]) < 1e-2, (i, grad[i])
