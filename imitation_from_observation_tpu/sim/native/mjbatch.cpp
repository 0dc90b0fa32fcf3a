// Native batched MuJoCo stepping.
//
// Replaces the compute role of the reference's mujoco-py ctypes layer
// (rllab/mujoco_py/mjlib.py + 6k generated struct wrappers): a pool of
// (mjModel copy, mjData) pairs stepped in one C call per control batch —
// no per-env Python dispatch in the hot loop, and ctypes releases the GIL
// for the whole batch so host threads can overlap.
//
// C ABI (consumed by sim/native/mjbatch_binding.py):
//   mjb_create(xml_path, n)       -> pool handle (NULL on failure)
//   mjb_sizes(pool, &nq,&nv,&nu)
//   mjb_step(pool, ctrl[N*nu], n_substeps)
//   mjb_forward(pool)
//   mjb_get_state / mjb_set_state (qpos [N*nq], qvel [N*nv])
//   mjb_reset(pool, i)            -> mj_resetData for one sim
//   mjb_subtree_com(pool, body_id, out[N*3])
//   mjb_last_error()              -> static error string
//
// Build: sim/native/build_mjbatch.sh (links the pip wheel's libmujoco).

#include <cstring>
#include <string>
#include <vector>

#include <mujoco/mujoco.h>

namespace {

struct Pool {
  mjModel* proto = nullptr;
  std::vector<mjModel*> models;
  std::vector<mjData*> datas;
  int n = 0;

  ~Pool() {
    for (auto* d : datas)
      if (d) mj_deleteData(d);
    for (auto* m : models)
      if (m) mj_deleteModel(m);
    if (proto) mj_deleteModel(proto);
  }
};

static char g_error[1024] = {0};

}  // namespace

extern "C" {

const char* mjb_last_error() { return g_error; }

void* mjb_create(const char* xml_path, int n) {
  char err[1000];
  mjModel* proto = mj_loadXML(xml_path, nullptr, err, sizeof(err));
  if (!proto) {
    std::snprintf(g_error, sizeof(g_error), "mj_loadXML: %s", err);
    return nullptr;
  }
  auto* pool = new Pool();
  pool->proto = proto;
  pool->n = n;
  pool->models.resize(n);
  pool->datas.resize(n);
  for (int i = 0; i < n; ++i) {
    // per-sim model copy: envs mutate model fields (geom_rgba/geom_pos)
    pool->models[i] = mj_copyModel(nullptr, proto);
    pool->datas[i] = mj_makeData(pool->models[i]);
    if (!pool->models[i] || !pool->datas[i]) {
      std::snprintf(g_error, sizeof(g_error), "allocation failed for sim %d", i);
      delete pool;
      return nullptr;
    }
    mj_forward(pool->models[i], pool->datas[i]);
  }
  return pool;
}

void mjb_destroy(void* handle) { delete static_cast<Pool*>(handle); }

void mjb_sizes(void* handle, int* nq, int* nv, int* nu) {
  auto* p = static_cast<Pool*>(handle);
  *nq = p->proto->nq;
  *nv = p->proto->nv;
  *nu = p->proto->nu;
}

void mjb_step(void* handle, const double* ctrl, int n_substeps) {
  auto* p = static_cast<Pool*>(handle);
  const int nu = p->proto->nu;
  for (int i = 0; i < p->n; ++i) {
    std::memcpy(p->datas[i]->ctrl, ctrl + (size_t)i * nu, sizeof(double) * nu);
    for (int s = 0; s < n_substeps; ++s) mj_step(p->models[i], p->datas[i]);
  }
}

void mjb_forward(void* handle) {
  auto* p = static_cast<Pool*>(handle);
  for (int i = 0; i < p->n; ++i) mj_forward(p->models[i], p->datas[i]);
}

void mjb_get_state(void* handle, double* qpos, double* qvel) {
  auto* p = static_cast<Pool*>(handle);
  const int nq = p->proto->nq, nv = p->proto->nv;
  for (int i = 0; i < p->n; ++i) {
    std::memcpy(qpos + (size_t)i * nq, p->datas[i]->qpos, sizeof(double) * nq);
    std::memcpy(qvel + (size_t)i * nv, p->datas[i]->qvel, sizeof(double) * nv);
  }
}

void mjb_set_state(void* handle, const double* qpos, const double* qvel) {
  auto* p = static_cast<Pool*>(handle);
  const int nq = p->proto->nq, nv = p->proto->nv;
  for (int i = 0; i < p->n; ++i) {
    std::memcpy(p->datas[i]->qpos, qpos + (size_t)i * nq, sizeof(double) * nq);
    std::memcpy(p->datas[i]->qvel, qvel + (size_t)i * nv, sizeof(double) * nv);
    mj_forward(p->models[i], p->datas[i]);
  }
}

void mjb_reset(void* handle, int i) {
  auto* p = static_cast<Pool*>(handle);
  mj_resetData(p->models[i], p->datas[i]);
  mj_forward(p->models[i], p->datas[i]);
}

void mjb_subtree_com(void* handle, int body_id, double* out) {
  auto* p = static_cast<Pool*>(handle);
  for (int i = 0; i < p->n; ++i)
    std::memcpy(out + (size_t)i * 3, &p->datas[i]->subtree_com[3 * body_id], sizeof(double) * 3);
}

}  // extern "C"
