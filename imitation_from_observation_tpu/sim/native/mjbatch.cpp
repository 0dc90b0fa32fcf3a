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
//   mjb_get_state / mjb_set_state (qpos [N*nq], qvel [N*nv])
//   mjb_set_state_one(pool, i, qpos, qvel)
//   mjb_reset(pool, i)            -> mj_resetData for one sim
//   mjb_subtree_com(pool, body_id, out[N*3])
//   mjb_last_error()              -> static error string
//
// Batched offscreen rendering (replaces the reference's GLFW/FBO viewer,
// rllab/mujoco_py/mjviewer.py:46-120, as planned in SURVEY §2.8(2)):
//   mjb_render_setup(pool, w, h, fast) -> 0 ok / -1 (see mjb_last_error)
//   mjb_render(pool, cams[n*nvp*6], nvp, out[n*nvp*h*w*3]) -> 0 ok
//       cams rows: lookat xyz, distance, elevation, azimuth (free camera,
//       same fields as the tasks' camera_pose()); frames are top-down RGB.
//   mjb_ngeom(pool)
//   mjb_sync_geoms(pool, i, rgba[ngeom*4] float, pos[ngeom*3] double)
//       -> push per-env randomized colors/positions into slot i
//
// One process-wide EGL context is created lazily via dlopen("libEGL.so.1")
// (the image has the mesa runtime but no EGL dev headers, so the tiny API
// surface used here is declared inline). All sims of a pool render through
// one mjrContext — a single C call per vec-step renders every env at every
// viewpoint with the GIL released.
//
// Build: sim/native/build_mjbatch.sh (links the pip wheel's libmujoco).

#include <dlfcn.h>

#include <cstring>
#include <mutex>
#include <string>
#include <vector>

#include <mujoco/mujoco.h>

namespace {

// ---- minimal EGL surface (mesa runtime only; no dev headers in image) ----
typedef void* EGLDisplay;
typedef void* EGLConfig;
typedef void* EGLContext;
typedef void* EGLSurface;
typedef int EGLint;
typedef unsigned int EGLBoolean;
typedef unsigned int EGLenum;

#define EGL_DEFAULT_DISPLAY ((void*)0)
#define EGL_NO_CONTEXT ((EGLContext)0)
#define EGL_NO_SURFACE ((EGLSurface)0)
enum : EGLint {
  EGL_ALPHA_SIZE = 0x3021,
  EGL_BLUE_SIZE = 0x3022,
  EGL_GREEN_SIZE = 0x3023,
  EGL_RED_SIZE = 0x3024,
  EGL_DEPTH_SIZE = 0x3025,
  EGL_STENCIL_SIZE = 0x3026,
  EGL_SURFACE_TYPE = 0x3033,
  EGL_NONE = 0x3038,
  EGL_RENDERABLE_TYPE = 0x3040,
  EGL_HEIGHT = 0x3056,
  EGL_WIDTH = 0x3057,
  EGL_PBUFFER_BIT = 0x0001,
  EGL_OPENGL_BIT = 0x0008,
};
#define EGL_OPENGL_API 0x30A2u

struct Egl {
  EGLDisplay dpy = nullptr;
  EGLContext ctx = nullptr;
  EGLSurface surf = nullptr;
  EGLBoolean (*MakeCurrent)(EGLDisplay, EGLSurface, EGLSurface, EGLContext) = nullptr;
  bool ok = false;
};

static Egl g_egl;  // one process-wide GL context for all pools
static char g_error[1024] = {0};
// One EGL context can be current on ONE thread at a time, and ctypes
// releases the GIL for every call — all GL work (init, make-current,
// render, context teardown) serializes on this mutex so overlapping host
// threads cannot steal the context mid-render or race a partial g_egl.
static std::mutex g_gl_mu;

static bool egl_init_locked() {
  if (g_egl.ok) return true;
  // libOpenGL first with RTLD_GLOBAL so GL symbol resolution works for
  // libmujoco's loader (mirrors mujoco/egl/egl_ext.py)
  dlopen("libOpenGL.so.0", RTLD_NOW | RTLD_GLOBAL);
  void* lib = dlopen("libEGL.so.1", RTLD_NOW | RTLD_GLOBAL);
  if (!lib) {
    std::snprintf(g_error, sizeof(g_error), "dlopen libEGL.so.1: %s", dlerror());
    return false;
  }
  auto* GetProcAddress = (void* (*)(const char*))dlsym(lib, "eglGetProcAddress");
  auto* Initialize = (EGLBoolean(*)(EGLDisplay, EGLint*, EGLint*))dlsym(lib, "eglInitialize");
  auto* ChooseConfig = (EGLBoolean(*)(EGLDisplay, const EGLint*, EGLConfig*, EGLint, EGLint*))dlsym(
      lib, "eglChooseConfig");
  auto* BindAPI = (EGLBoolean(*)(EGLenum))dlsym(lib, "eglBindAPI");
  auto* CreateContext = (EGLContext(*)(EGLDisplay, EGLConfig, EGLContext, const EGLint*))dlsym(
      lib, "eglCreateContext");
  g_egl.MakeCurrent =
      (EGLBoolean(*)(EGLDisplay, EGLSurface, EGLSurface, EGLContext))dlsym(lib, "eglMakeCurrent");
  if (!GetProcAddress || !Initialize || !ChooseConfig || !BindAPI || !CreateContext ||
      !g_egl.MakeCurrent) {
    std::snprintf(g_error, sizeof(g_error), "missing EGL symbol");
    return false;
  }
  // Headless display via the device-platform extension, like mujoco's python
  // egl module (a bare eglGetDisplay(EGL_DEFAULT_DISPLAY) fails without X).
  typedef void* EGLDeviceEXT;
  auto* QueryDevices =
      (EGLBoolean(*)(EGLint, EGLDeviceEXT*, EGLint*))GetProcAddress("eglQueryDevicesEXT");
  auto* GetPlatformDisplay = (EGLDisplay(*)(EGLenum, void*, const EGLint*))GetProcAddress(
      "eglGetPlatformDisplayEXT");
  if (!QueryDevices || !GetPlatformDisplay) {
    std::snprintf(g_error, sizeof(g_error), "EGL device-platform extension unavailable");
    return false;
  }
  EGLDeviceEXT devices[16];
  EGLint n_dev = 0;
  QueryDevices(16, devices, &n_dev);
  constexpr EGLenum kPlatformDeviceExt = 0x313F;
  for (EGLint d = 0; d < n_dev && !g_egl.dpy; ++d) {
    EGLDisplay dpy = GetPlatformDisplay(kPlatformDeviceExt, devices[d], nullptr);
    if (dpy && Initialize(dpy, nullptr, nullptr)) g_egl.dpy = dpy;
  }
  if (!g_egl.dpy) {
    std::snprintf(g_error, sizeof(g_error), "no initializable EGL device display (%d devices)",
                  (int)n_dev);
    return false;
  }
  constexpr EGLint kColorBufferType = 0x303F, kRgbBuffer = 0x308E;
  const EGLint cfg_attr[] = {EGL_RED_SIZE,   8,       EGL_GREEN_SIZE,      8,
                             EGL_BLUE_SIZE,  8,       EGL_ALPHA_SIZE,      8,
                             EGL_DEPTH_SIZE, 24,      EGL_STENCIL_SIZE,    8,
                             kColorBufferType, kRgbBuffer,
                             EGL_SURFACE_TYPE, EGL_PBUFFER_BIT,
                             EGL_RENDERABLE_TYPE, EGL_OPENGL_BIT, EGL_NONE};
  EGLConfig cfg;
  EGLint ncfg = 0;
  if (!ChooseConfig(g_egl.dpy, cfg_attr, &cfg, 1, &ncfg) || ncfg < 1) {
    std::snprintf(g_error, sizeof(g_error), "eglChooseConfig found no config");
    return false;
  }
  BindAPI(EGL_OPENGL_API);
  g_egl.ctx = CreateContext(g_egl.dpy, cfg, EGL_NO_CONTEXT, nullptr);
  // surfaceless current (EGL_KHR_surfaceless_context; mjr renders to its FBO)
  g_egl.surf = EGL_NO_SURFACE;
  if (!g_egl.ctx || !g_egl.MakeCurrent(g_egl.dpy, g_egl.surf, g_egl.surf, g_egl.ctx)) {
    std::snprintf(g_error, sizeof(g_error), "EGL context creation/make-current failed");
    return false;
  }
  g_egl.ok = true;
  return true;
}

static bool egl_make_current_locked() {
  if (!g_egl.ok) return false;
  if (!g_egl.MakeCurrent(g_egl.dpy, g_egl.surf, g_egl.surf, g_egl.ctx)) {
    std::snprintf(g_error, sizeof(g_error),
                  "eglMakeCurrent failed (context current on another thread?)");
    return false;
  }
  return true;
}

struct Pool {
  mjModel* proto = nullptr;
  std::vector<mjModel*> models;
  std::vector<mjData*> datas;
  int n = 0;

  // rendering (lazily set up by mjb_render_setup)
  bool render_ready = false;
  bool fast = true;
  int rw = 0, rh = 0;
  mjvScene scn;
  mjvOption vopt;
  mjrContext con;
  std::vector<unsigned char> flipbuf;

  ~Pool() {
    if (render_ready) {
      std::lock_guard<std::mutex> lk(g_gl_mu);
      if (egl_make_current_locked()) {
        mjr_freeContext(&con);
        mjv_freeScene(&scn);
      }  // else: leak the GL objects rather than free against a wrong context
    }
    for (auto* d : datas)
      if (d) mj_deleteData(d);
    for (auto* m : models)
      if (m) mj_deleteModel(m);
    if (proto) mj_deleteModel(proto);
  }
};

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

void mjb_step_fwd(void* handle, const double* ctrl, int n_substeps, int do_forward) {
  // mjb_step + optional trailing mj_forward. The python frames-on path
  // refreshes derived quantities (subtree_com/geom_xpos) before rendering
  // (sim/base.py::render does mj_forward first); the batched vec env calls
  // this with do_forward=1 on render steps so reward math and frames see
  // the same kinematics as the python path.
  auto* p = static_cast<Pool*>(handle);
  const int nu = p->proto->nu;
  for (int i = 0; i < p->n; ++i) {
    std::memcpy(p->datas[i]->ctrl, ctrl + (size_t)i * nu, sizeof(double) * nu);
    for (int s = 0; s < n_substeps; ++s) mj_step(p->models[i], p->datas[i]);
    if (do_forward) mj_forward(p->models[i], p->datas[i]);
  }
}

void mjb_site_xpos(void* handle, int site_id, double* out) {
  auto* p = static_cast<Pool*>(handle);
  for (int i = 0; i < p->n; ++i)
    std::memcpy(out + (size_t)i * 3, &p->datas[i]->site_xpos[3 * site_id], sizeof(double) * 3);
}

void mjb_geom_state(void* handle, double* xpos, double* xmat) {
  // Export per-env world geom poses [n, ngeom, 3] + [n, ngeom, 9] for the
  // on-device raycast renderer (sim/raycast.py) — the whole scene state a
  // frame depends on, ~n*ngeom*96 bytes of memcpy per render step.
  auto* p = static_cast<Pool*>(handle);
  const int ng = p->proto->ngeom;
  for (int i = 0; i < p->n; ++i) {
    std::memcpy(xpos + (size_t)i * ng * 3, p->datas[i]->geom_xpos, sizeof(double) * 3 * ng);
    std::memcpy(xmat + (size_t)i * ng * 9, p->datas[i]->geom_xmat, sizeof(double) * 9 * ng);
  }
}

void mjb_set_state_one(void* handle, int i, const double* qpos, const double* qvel) {
  auto* p = static_cast<Pool*>(handle);
  std::memcpy(p->datas[i]->qpos, qpos, sizeof(double) * p->proto->nq);
  std::memcpy(p->datas[i]->qvel, qvel, sizeof(double) * p->proto->nv);
  mj_forward(p->models[i], p->datas[i]);
}

int mjb_ngeom(void* handle) { return static_cast<Pool*>(handle)->proto->ngeom; }

void mjb_sync_geoms(void* handle, int i, const float* rgba, const double* pos) {
  auto* p = static_cast<Pool*>(handle);
  mjModel* m = p->models[i];
  if (rgba) std::memcpy(m->geom_rgba, rgba, sizeof(float) * 4 * m->ngeom);
  if (pos) std::memcpy(m->geom_pos, pos, sizeof(double) * 3 * m->ngeom);
}

int mjb_render_setup(void* handle, int width, int height, int fast) {
  auto* p = static_cast<Pool*>(handle);
  if (p->render_ready) return 0;
  std::lock_guard<std::mutex> lk(g_gl_mu);
  if (!egl_init_locked()) return -1;
  // egl_init only binds on FIRST init; python mujoco.Renderer instances
  // bind their own contexts (and unbind on close) in between, and
  // mjr_makeContext with no current context dies in mju_error ("Default
  // framebuffer is not complete, error 0x0") — rebind ours explicitly.
  if (!egl_make_current_locked()) return -1;
  p->rw = width;
  p->rh = height;
  p->fast = fast != 0;
  // the offscreen framebuffer is sized from the model's visual globals;
  // fast mode skips shadowmap allocation + MSAA (see EnvConfig.render_quality)
  for (mjModel* m : p->models) {
    m->vis.global.offwidth = width;
    m->vis.global.offheight = height;
    if (p->fast) {
      m->vis.quality.offsamples = 0;
      m->vis.quality.shadowsize = 0;
    }
  }
  p->proto->vis.global.offwidth = width;
  p->proto->vis.global.offheight = height;
  if (p->fast) {
    p->proto->vis.quality.offsamples = 0;
    p->proto->vis.quality.shadowsize = 0;
  }
  mjv_defaultOption(&p->vopt);
  mjv_defaultScene(&p->scn);
  mjv_makeScene(p->proto, &p->scn, 2000);
  mjr_defaultContext(&p->con);
  mjr_makeContext(p->proto, &p->con, mjFONTSCALE_100);
  mjr_setBuffer(mjFB_OFFSCREEN, &p->con);
  if (p->con.currentBuffer != mjFB_OFFSCREEN) {
    std::snprintf(g_error, sizeof(g_error), "offscreen framebuffer unavailable");
    mjr_freeContext(&p->con);
    mjv_freeScene(&p->scn);
    return -1;
  }
  p->flipbuf.resize((size_t)width * height * 3);
  p->render_ready = true;
  return 0;
}

int mjb_render(void* handle, const double* cams, int nvp, unsigned char* out) {
  auto* p = static_cast<Pool*>(handle);
  if (!p->render_ready) {
    std::snprintf(g_error, sizeof(g_error), "mjb_render before mjb_render_setup");
    return -1;
  }
  std::lock_guard<std::mutex> lk(g_gl_mu);
  if (!egl_make_current_locked()) return -1;  // another context (e.g. python
                       // mujoco.Renderer) may have bound this thread in between
  const int w = p->rw, h = p->rh;
  const size_t frame_bytes = (size_t)w * h * 3;
  mjrRect viewport = {0, 0, w, h};
  mjvCamera cam;
  mjv_defaultCamera(&cam);
  cam.type = mjCAMERA_FREE;
  for (int i = 0; i < p->n; ++i) {
    for (int v = 0; v < nvp; ++v) {
      const double* c = cams + ((size_t)i * nvp + v) * 6;
      cam.lookat[0] = c[0];
      cam.lookat[1] = c[1];
      cam.lookat[2] = c[2];
      cam.distance = c[3];
      cam.elevation = c[4];
      cam.azimuth = c[5];
      unsigned char* buf = p->flipbuf.data();
      // black-frame retry mirrors the reference's render loop
      // (gym/envs/mujoco/mujoco_env.py:117-122)
      for (int attempt = 0; attempt < 10; ++attempt) {
        mjv_updateScene(p->models[i], p->datas[i], &p->vopt, nullptr, &cam, mjCAT_ALL,
                        &p->scn);
        if (p->fast) {
          p->scn.flags[mjRND_SHADOW] = 0;
          p->scn.flags[mjRND_REFLECTION] = 0;
        }
        mjr_render(viewport, &p->scn, &p->con);
        mjr_readPixels(buf, nullptr, viewport, &p->con);
        unsigned char mx = 0;
        for (size_t k = 0; k < frame_bytes && mx == 0; k += 97) mx |= buf[k];
        if (mx != 0) break;
      }
      // readPixels is bottom-up; emit top-down rows
      unsigned char* dst = out + ((size_t)i * nvp + v) * frame_bytes;
      for (int row = 0; row < h; ++row)
        std::memcpy(dst + (size_t)row * w * 3, buf + (size_t)(h - 1 - row) * w * 3,
                    (size_t)w * 3);
    }
  }
  return 0;
}

}  // extern "C"
