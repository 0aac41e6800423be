// Native host event compiler: NoteTracker + PolyphonyDispatcher + Trigger
// over the full song, emitting per-subvoice segment tables.
//
// Port of the Python pipeline in core/timeline.py (compile_timelines), which
// itself mirrors the reference semantics:
//   - NoteTracker block consumption with float32 clock arithmetic
//     (src/zang/notes.zig:162-206) — frame positions depend on f32 rounding,
//     so all time math here is plain `float` and the TU is compiled with
//     -ffp-contract=off (no FMA contractions).
//   - PolyphonyDispatcher slot routing with note-off matching, oldest-
//     released reuse, oldest-note-on stealing (src/zang/notes.zig:246-306).
//   - Trigger span splitting with cross-block carry and same-frame
//     later-impulse-wins (src/zang/trigger.zig:107-196).
//
// Params stay in Python; events are referenced by index, and segment dedup
// (continuation spans with equal params) uses caller-provided equality-class
// ids so dict value-equality semantics are preserved exactly.

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {

struct Impulse {
  int frame;     // block-relative frame
  int note_id;
  int event_id;
  int event_idx; // index into the song arrays
};

struct Slot {
  int note_id = 0;
  int event_id = 0;
  bool note_on = false;
  bool used = false;
};

struct TriggerState {
  bool has_note = false;
  int note_id = 0;
  int event_idx = 0;
};

}  // namespace

extern "C" {

// Returns 0 on success, 1 = events out of chronological order,
// 2 = segment capacity exceeded.
int zt_compile_timelines(
    const float* ev_t, const int32_t* ev_note_id,
    const uint8_t* ev_note_on, const int32_t* ev_eq_class, int num_events,
    int polyphony, float sample_rate, int64_t total_frames, int block_size,
    int64_t* seg_starts, uint8_t* seg_resets, int32_t* seg_event,
    int cap, int32_t* seg_counts) {
  // tracker state
  int next_song_event = 0;
  float t = 0.0f;

  std::vector<Slot> slots(polyphony);
  std::vector<TriggerState> trig(polyphony);
  std::vector<std::vector<Impulse>> per_voice(polyphony);
  for (int v = 0; v < polyphony; ++v) {
    seg_counts[v] = 0;
    per_voice[v].reserve(32);
  }

  auto append_seg = [&](int v, int64_t abs_start, bool reset,
                        int event_idx) -> bool {
    int32_t& count = seg_counts[v];
    if (count > 0 && !reset) {
      int prev_ev = seg_event[(int64_t)v * cap + count - 1];
      // continuation with value-equal params: skip (timeline.py dedup)
      if (ev_eq_class[prev_ev] == ev_eq_class[event_idx]) return true;
    }
    if (count >= cap) return false;
    int64_t base = (int64_t)v * cap + count;
    seg_starts[base] = abs_start;
    seg_resets[base] = reset ? 1 : 0;
    seg_event[base] = event_idx;
    ++count;
    return true;
  };

  for (int64_t block_start = 0; block_start < total_frames;
       block_start += block_size) {
    const int out_len = (int)(total_frames - block_start < block_size
                                  ? total_frames - block_start
                                  : block_size);

    // --- NoteTracker.consume (f32 arithmetic, notes.py:119-151) ---
    const float buf_time = (float)out_len / sample_rate;
    const float end_t = t + buf_time;
    std::vector<Impulse> impulses;
    float start_t = t;
    while (next_song_event < num_events) {
      const float note_t = ev_t[next_song_event];
      if (note_t < start_t) return 1;  // out of order
      if (!(note_t < end_t)) break;
      const float f = (note_t - t) / buf_time;
      int rel = (int)(f * (float)out_len);  // trunc toward zero
      if (rel > out_len - 1) rel = out_len - 1;
      ++next_song_event;
      impulses.push_back(Impulse{rel, ev_note_id[next_song_event - 1],
                                 next_song_event, next_song_event - 1});
      start_t = note_t;
    }
    t = end_t;

    // --- PolyphonyDispatcher.dispatch (notes.py:196-211) ---
    for (int v = 0; v < polyphony; ++v) per_voice[v].clear();
    for (const Impulse& imp : impulses) {
      const bool note_on = ev_note_on[imp.event_idx] != 0;
      int chosen = -1;
      if (!note_on) {
        for (int s = 0; s < polyphony; ++s) {
          if (slots[s].used && slots[s].note_id == imp.note_id &&
              slots[s].note_on) {
            chosen = s;
            break;
          }
        }
      } else {
        int best = -1;
        for (int s = 0; s < polyphony; ++s) {
          if (!slots[s].used) {
            chosen = s;
            break;
          }
          if (!slots[s].note_on &&
              (best < 0 || slots[s].event_id < slots[best].event_id)) {
            best = s;
          }
        }
        if (chosen < 0) {
          if (best >= 0) {
            chosen = best;
          } else {
            chosen = 0;
            for (int s = 1; s < polyphony; ++s) {
              if (slots[s].event_id < slots[chosen].event_id) chosen = s;
            }
          }
        }
      }
      if (chosen < 0) continue;
      slots[chosen] = Slot{imp.note_id, imp.event_id, note_on, true};
      per_voice[chosen].push_back(imp);
    }

    // --- Trigger.iterate per voice (trigger.py:42-107) ---
    for (int v = 0; v < polyphony; ++v) {
      const std::vector<Impulse>& imps = per_voice[v];
      TriggerState& tr = trig[v];
      std::size_t idx = 0;
      int start = 0;
      const int end = out_len;
      while (start < end) {
        int seg_start, seg_end;
        bool have_note = false;
        int note_id = 0, event_idx = 0;
        bool carried = false;
        if (tr.has_note) {
          if (idx < imps.size()) {
            const int next_frame = imps[idx].frame;
            if (next_frame > start) {
              seg_start = start;
              seg_end = next_frame < end ? next_frame : end;
              have_note = true;
              note_id = tr.note_id;
              event_idx = tr.event_idx;
              carried = true;
            }
          } else {
            seg_start = start;
            seg_end = end;
            have_note = true;
            note_id = tr.note_id;
            event_idx = tr.event_idx;
            carried = true;
          }
        }
        if (!carried) {
          // _next_note_span
          seg_start = start;
          seg_end = end;
          std::size_t i = idx;
          bool found = false;
          while (i < imps.size()) {
            const Impulse& imp = imps[i];
            if (imp.frame >= end) break;  // shouldn't happen
            if (imp.frame > start) {
              seg_end = imp.frame;  // silent gap span, no note
              break;
            }
            ++i;
            int note_end = end;
            if (i < imps.size() && imps[i].frame < end)
              note_end = imps[i].frame;
            if (note_end <= start) continue;  // same frame: later wins
            seg_end = note_end;
            have_note = true;
            note_id = imp.note_id;
            event_idx = imp.event_idx;
            found = true;
            break;
          }
          idx = i;
          (void)found;
        }
        start = seg_end;
        if (have_note) {
          const bool changed = !tr.has_note || note_id != tr.note_id;
          tr.has_note = true;
          tr.note_id = note_id;
          tr.event_idx = event_idx;
          if (!append_seg(v, block_start + seg_start, changed, event_idx))
            return 2;
        }
      }
    }
  }
  return 0;
}

}  // extern "C"
