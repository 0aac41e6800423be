"""Interactive-host utilities: parameters, recorder, reload watching.

Offline counterparts of the reference's SDL-host features:
- Parameter (examples/common.zig:9-14 + example.zig:324-392): integer-valued
  live parameters with arrow-key stepping and Backspace randomization
  (favor_low_values biases the randomizer toward small values).
- Recorder (examples/recorder.zig:18-170): record a keypress performance,
  then loop it back with preserved relative timing.
- watch_script (watch_script.sh + example.zig:89-133): file watching and an
  optional UDP "reload" listener driving LiveScript reloads.
"""

import os
import socket
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple


@dataclass
class Parameter:
    """A live-tweakable integer parameter (common.zig:9-14)."""

    desc: str
    num_values: int
    current_value: int = 0
    favor_low_values: bool = False

    def step(self, delta: int) -> int:
        self.current_value = max(0, min(self.num_values - 1,
                                        self.current_value + delta))
        return self.current_value

    def randomize(self, rng) -> int:
        # example.zig:373-391: favor_low_values squares the uniform draw
        u = rng.random()
        if self.favor_low_values:
            u = u * u
        self.current_value = min(self.num_values - 1,
                                 int(u * self.num_values))
        return self.current_value


MAX_RECORDER_NOTES = 5000  # recorder.zig:16


@dataclass
class Recorder:
    """Keypress record/loop-playback state machine (recorder.zig:18-170).

    States: idle -> recording (first event starts the clock) -> playing
    (loops the recorded events with preserved timing).
    """

    state: str = "idle"
    events: List[Tuple[float, int, bool]] = field(default_factory=list)
    _record_start: float = 0.0
    _loop_length: float = 0.0
    _play_start: float = 0.0
    _play_index: int = 0

    def start_recording(self, now: float) -> None:
        self.state = "recording"
        self.events = []
        self._record_start = now

    def record_event(self, now: float, key: int, down: bool) -> bool:
        if self.state != "recording":
            return False
        if len(self.events) >= MAX_RECORDER_NOTES:
            return False  # silently full, like the reference
        if not self.events:
            self._record_start = now
        self.events.append((now - self._record_start, key, down))
        return True

    def start_playing(self, now: float, loop_length: Optional[float] = None) -> None:
        self.state = "playing"
        if loop_length is None:
            loop_length = (self.events[-1][0] + 0.25) if self.events else 0.0
        self._loop_length = loop_length
        self._play_start = now
        self._play_index = 0

    def poll(self, now: float) -> List[Tuple[int, bool]]:
        """Events due at `now`; loops when the loop length elapses."""
        if self.state != "playing" or not self.events:
            return []
        out = []
        while True:
            t = now - self._play_start
            if self._play_index < len(self.events) and self.events[self._play_index][0] <= t:
                _, key, down = self.events[self._play_index]
                out.append((key, down))
                self._play_index += 1
            elif t >= self._loop_length > 0:
                self._play_start += self._loop_length
                self._play_index = 0
            else:
                break
        return out

    def stop(self) -> None:
        self.state = "idle"


class ReloadWatcher:
    """Drive LiveScript reloads from file mtime changes and/or UDP 'reload'
    messages (the ZANG_LISTEN_PORT flow, example.zig:89-133,225-238)."""

    def __init__(self, live_script, udp_port: Optional[int] = None):
        self.live = live_script
        self.udp_port = udp_port
        self._sock = None
        self._stop = threading.Event()
        self._thread = None
        self.reload_count = 0
        if udp_port is None and os.environ.get("ZANG_LISTEN_PORT"):
            self.udp_port = int(os.environ["ZANG_LISTEN_PORT"])

    def poll(self) -> bool:
        """Check for file changes (call periodically). True if reloaded OK."""
        if self.live.maybe_reload():
            self.reload_count += 1
            return True
        return False

    def start_udp(self) -> None:
        assert self.udp_port is not None
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind(("127.0.0.1", self.udp_port))
        self._sock.settimeout(0.2)

        def loop():
            while not self._stop.is_set():
                try:
                    data, _ = self._sock.recvfrom(64)
                except socket.timeout:
                    continue
                except OSError:
                    break
                if data.strip() == b"reload":
                    if self.live.reload():
                        self.reload_count += 1

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=1.0)
        if self._sock:
            self._sock.close()
