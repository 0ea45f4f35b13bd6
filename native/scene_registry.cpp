// Native scene registry: the runtime tier of the audio ray tracer.
//
// C++ re-design of the reference's registry layer:
//   - AudioColliderManager / AudioTargetManager (Audio/*.cs): typed
//     collider stores with O(1) add / swap-back remove and id fixup
//   - NativeJobBatch<T> (DataTypes/NativeJobBatch.cs): double buffering —
//     mutators write the "next" batch while the compute path reads a
//     stable "job" snapshot, published by update_job_batch()
//   - NativeIdPool (DataTypes/NativeIdPool.cs): dense target indices with
//     swap-back removal; collider target_id fixup happens here because
//     the registry owns both sides (the reference does it via
//     UpdateValue<short> change callbacks)
//
// The API is a flat C ABI for ctypes; primitive records are fixed-stride
// float rows so Python can view the job batch zero-copy as numpy arrays.
//
// Record layouts (floats per row):
//   sphere: cx cy cz r  absorption density echo target_id        (8)
//   aabb:   cx cy cz hx hy hz absorption density echo target_id  (10)
//   obb:    cx cy cz hx hy hz qx qy qz qw abs dens echo target   (14)
// target_id is stored as float (-1 = none); quats are the pre-inverted
// rotation, exactly as baked by the reference (AudioOBBCollider.cs:59).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kSphere = 0;
constexpr int kAabb = 1;
constexpr int kObb = 2;
constexpr int kStride[3] = {8, 10, 14};
constexpr int kTargetField[3] = {7, 9, 13};

struct TypedStore {
  int stride = 0;
  std::vector<float> next;           // mutable batch
  std::vector<float> job;            // stable snapshot
  std::vector<int64_t> slot_handle;  // dense slot -> stable handle
  bool dirty = false;

  int count() const { return static_cast<int>(slot_handle.size()); }

  int add_row(const float* row, int64_t handle) {
    next.insert(next.end(), row, row + stride);
    slot_handle.push_back(handle);
    dirty = true;
    return count() - 1;
  }

  void update_row(int slot, const float* row) {
    std::memcpy(&next[static_cast<size_t>(slot) * stride], row,
                sizeof(float) * stride);
    dirty = true;
  }

  // Swap-back removal; returns the handle of the element moved into
  // `slot` (or -1 if the last element was removed).
  int64_t remove_row(int slot) {
    int last = count() - 1;
    int64_t moved = -1;
    if (slot != last) {
      std::memcpy(&next[static_cast<size_t>(slot) * stride],
                  &next[static_cast<size_t>(last) * stride],
                  sizeof(float) * stride);
      moved = slot_handle[last];
      slot_handle[slot] = moved;
    }
    next.resize(static_cast<size_t>(last) * stride);
    slot_handle.pop_back();
    dirty = true;
    return moved;
  }

  bool publish() {
    if (!dirty) return false;
    job = next;  // the NativeJobBatch memcpy
    dirty = false;
    return true;
  }
};

struct HandleEntry {
  int type = -1;
  int slot = -1;  // -1 = freed
};

struct Registry {
  TypedStore stores[3];
  std::vector<HandleEntry> handles;  // stable handle -> (type, slot)
  std::vector<int64_t> free_handles;

  std::vector<float> target_next;  // 3 floats per target
  std::vector<float> target_job;
  bool target_dirty = false;
  uint64_t version = 0;

  Registry() {
    for (int t = 0; t < 3; ++t) stores[t].stride = kStride[t];
  }

  int64_t alloc_handle(int type, int slot) {
    int64_t h;
    if (!free_handles.empty()) {
      h = free_handles.back();
      free_handles.pop_back();
    } else {
      h = static_cast<int64_t>(handles.size());
      handles.push_back({});
    }
    handles[static_cast<size_t>(h)] = {type, slot};
    return h;
  }

  int target_count() const { return static_cast<int>(target_next.size() / 3); }
};

Registry* reg(void* p) { return static_cast<Registry*>(p); }

}  // namespace

extern "C" {

void* art_registry_create() { return new Registry(); }

void art_registry_destroy(void* p) { delete reg(p); }

// ---- Colliders ----------------------------------------------------------

int64_t art_add(void* p, int type, const float* row) {
  Registry* r = reg(p);
  int64_t h = r->alloc_handle(type, 0);
  int slot = r->stores[type].add_row(row, h);
  r->handles[static_cast<size_t>(h)].slot = slot;
  return h;
}

int art_update(void* p, int64_t handle, const float* row) {
  Registry* r = reg(p);
  if (handle < 0 || handle >= static_cast<int64_t>(r->handles.size()))
    return -1;
  HandleEntry e = r->handles[static_cast<size_t>(handle)];
  if (e.slot < 0) return -1;
  r->stores[e.type].update_row(e.slot, row);
  return 0;
}

int art_remove(void* p, int64_t handle) {
  Registry* r = reg(p);
  if (handle < 0 || handle >= static_cast<int64_t>(r->handles.size()))
    return -1;
  HandleEntry e = r->handles[static_cast<size_t>(handle)];
  if (e.slot < 0) return -1;
  int64_t moved = r->stores[e.type].remove_row(e.slot);
  if (moved >= 0) r->handles[static_cast<size_t>(moved)].slot = e.slot;
  r->handles[static_cast<size_t>(handle)] = {-1, -1};
  r->free_handles.push_back(handle);
  return 0;
}

int art_handle_slot(void* p, int64_t handle) {
  Registry* r = reg(p);
  if (handle < 0 || handle >= static_cast<int64_t>(r->handles.size()))
    return -1;
  return r->handles[static_cast<size_t>(handle)].slot;
}

// ---- Targets ------------------------------------------------------------

int art_add_target(void* p, float x, float y, float z) {
  Registry* r = reg(p);
  r->target_next.push_back(x);
  r->target_next.push_back(y);
  r->target_next.push_back(z);
  r->target_dirty = true;
  return r->target_count() - 1;
}

// Per-frame position sync for moving sources (AudioTargetRT.cs:53-62,
// published via AudioTargetManager.cs:105-122). Bounds-checked like the
// reference's defensive id checks (AudioColliderManager.cs:92-93).
int art_set_target_position(void* p, int idx, float x, float y, float z) {
  Registry* r = reg(p);
  if (idx < 0 || idx >= r->target_count()) return -1;
  r->target_next[static_cast<size_t>(idx) * 3 + 0] = x;
  r->target_next[static_cast<size_t>(idx) * 3 + 1] = y;
  r->target_next[static_cast<size_t>(idx) * 3 + 2] = z;
  r->target_dirty = true;
  return 0;
}

// Swap-back target removal with collider target_id fixup (the reference's
// UpdateValue<short> change-callback chain, AudioTargetManager.cs:59-96).
int art_remove_target(void* p, int idx) {
  Registry* r = reg(p);
  int last = r->target_count() - 1;
  if (idx < 0 || idx > last) return -1;
  float moved_from = static_cast<float>(last);
  float removed = static_cast<float>(idx);
  if (idx != last) {
    for (int k = 0; k < 3; ++k)
      r->target_next[static_cast<size_t>(idx) * 3 + k] =
          r->target_next[static_cast<size_t>(last) * 3 + k];
  }
  r->target_next.resize(static_cast<size_t>(last) * 3);
  // Fix up collider ownership: owner of `removed` -> none; owner of
  // `moved_from` -> `removed`.
  for (int t = 0; t < 3; ++t) {
    TypedStore& s = r->stores[t];
    int f = kTargetField[t];
    for (int i = 0; i < s.count(); ++i) {
      float& tid = s.next[static_cast<size_t>(i) * s.stride + f];
      if (tid == removed) {
        tid = -1.0f;
        s.dirty = true;
      } else if (tid == moved_from) {
        tid = removed;
        s.dirty = true;
      }
    }
  }
  r->target_dirty = true;
  return 0;
}

// ---- Publication (double-buffer swap) -----------------------------------

int art_update_job_batch(void* p) {
  Registry* r = reg(p);
  bool changed = false;
  for (int t = 0; t < 3; ++t) changed |= r->stores[t].publish();
  if (r->target_dirty) {
    r->target_job = r->target_next;
    r->target_dirty = false;
    changed = true;
  }
  if (changed) ++r->version;
  return changed ? 1 : 0;
}

uint64_t art_version(void* p) { return reg(p)->version; }

void art_counts(void* p, int* counts4) {
  Registry* r = reg(p);
  for (int t = 0; t < 3; ++t)
    counts4[t] = static_cast<int>(r->stores[t].job.size()) / kStride[t];
  counts4[3] = static_cast<int>(r->target_job.size()) / 3;
}

const float* art_job_data(void* p, int type) {
  Registry* r = reg(p);
  if (type == 3) return r->target_job.data();
  return r->stores[type].job.data();
}

}  // extern "C"
