// d2s_native: host-side runtime primitives for desktop2stereo_tpu.
//
// The reference leans on native code for its host transport and capture:
// wincam/windows-capture (C++/Rust DXGI + WGC grabbers, reference
// capture.py:14, main.py:86-91) and pinned/PBO DMA rings for zero-copy
// delivery (reference viewer.py:20-170, xr_viewer/frame.py:62-161).  The
// TPU build's equivalents, C++ with a ctypes-friendly C ABI:
//
//  * shared-memory frame ring: a seqlock'd latest-frame-wins ring in POSIX
//    shm so external producers (capture agents, ffmpeg wrappers, remote
//    forwarders) hand frames to the Python pipeline with one memcpy and no
//    pickling/socket overhead — the host-IPC analog of the PBO ring;
//  * X11 screen capture via dlopen'd libX11 (+XShm when available) — the
//    Linux counterpart of the reference's DXGI duplication path;
//  * an absolute-deadline frame pacer (clock_nanosleep/TIMER_ABSTIME),
//    replacing the drift-prone sleep pacing in reference main.py:211-230.
//
// Build: g++ -O2 -shared -fPIC -o libd2s_native.so d2s_native.cpp -ldl
// (no X11 headers needed; all X symbols are resolved at runtime).

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <ctime>

#include <dlfcn.h>
#include <fcntl.h>
#include <sys/ioctl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <linux/input.h>
#include <linux/uinput.h>

extern "C" {

// ---------------------------------------------------------------------------
// Shared-memory latest-wins frame ring
// ---------------------------------------------------------------------------

struct RingHeader {
  uint32_t magic;          // 'D2SR'
  uint32_t slots;
  uint32_t max_bytes;      // per-slot payload capacity
  std::atomic<uint64_t> seq;  // global frame counter; slot = seq % slots
};

struct SlotHeader {
  std::atomic<uint64_t> start_seq;  // written before payload
  std::atomic<uint64_t> end_seq;    // written after payload (== start when stable)
  uint32_t width, height, channels;
  uint64_t timestamp_ns;
  uint32_t bytes;
};

struct Ring {
  RingHeader* hdr;
  uint8_t* base;
  size_t map_bytes;
  int fd;
  char name[256];
  int owner;
};

static const uint32_t kMagic = 0x44325352;  // "D2SR"
static const size_t kAlign = 64;

static size_t slot_stride(uint32_t max_bytes) {
  size_t s = sizeof(SlotHeader) + max_bytes;
  return (s + kAlign - 1) / kAlign * kAlign;
}

static SlotHeader* slot_at(Ring* r, uint64_t idx) {
  size_t stride = slot_stride(r->hdr->max_bytes);
  return reinterpret_cast<SlotHeader*>(
      r->base + sizeof(RingHeader) + (idx % r->hdr->slots) * stride);
}

void* d2s_ring_create(const char* name, uint32_t max_bytes, uint32_t slots) {
  if (slots < 2) slots = 2;
  size_t bytes = sizeof(RingHeader) + slots * slot_stride(max_bytes);
  shm_unlink(name);
  int fd = shm_open(name, O_CREAT | O_RDWR | O_EXCL, 0600);
  if (fd < 0) return nullptr;
  if (ftruncate(fd, (off_t)bytes) != 0) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  void* mem = mmap(nullptr, bytes, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  Ring* r = new Ring();
  r->hdr = reinterpret_cast<RingHeader*>(mem);
  r->base = reinterpret_cast<uint8_t*>(mem);
  r->map_bytes = bytes;
  r->fd = fd;
  r->owner = 1;
  snprintf(r->name, sizeof(r->name), "%s", name);
  r->hdr->magic = kMagic;
  r->hdr->slots = slots;
  r->hdr->max_bytes = max_bytes;
  r->hdr->seq.store(0);
  for (uint32_t i = 0; i < slots; ++i) {
    SlotHeader* s = slot_at(r, i);
    s->start_seq.store(0);
    s->end_seq.store(0);
  }
  return r;
}

void* d2s_ring_open(const char* name) {
  int fd = shm_open(name, O_RDWR, 0600);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < (off_t)sizeof(RingHeader)) {
    close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, (size_t)st.st_size, PROT_READ | PROT_WRITE,
                   MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  Ring* r = new Ring();
  r->hdr = reinterpret_cast<RingHeader*>(mem);
  if (r->hdr->magic != kMagic) {
    munmap(mem, (size_t)st.st_size);
    close(fd);
    delete r;
    return nullptr;
  }
  r->base = reinterpret_cast<uint8_t*>(mem);
  r->map_bytes = (size_t)st.st_size;
  r->fd = fd;
  r->owner = 0;
  snprintf(r->name, sizeof(r->name), "%s", name);
  return r;
}

// Returns the frame's sequence number, or 0 on error.
uint64_t d2s_ring_write(void* handle, const uint8_t* data, uint32_t width,
                        uint32_t height, uint32_t channels,
                        uint64_t timestamp_ns) {
  Ring* r = reinterpret_cast<Ring*>(handle);
  uint32_t bytes = width * height * channels;
  if (bytes == 0 || bytes > r->hdr->max_bytes) return 0;
  uint64_t seq = r->hdr->seq.load(std::memory_order_relaxed) + 1;
  SlotHeader* s = slot_at(r, seq);
  s->start_seq.store(seq, std::memory_order_relaxed);
  // StoreStore fence: the field/payload writes below must not become
  // visible before the slot is marked in-progress (start_seq != end_seq).
  // A release STORE only orders PRIOR writes; on weakly-ordered hosts the
  // memcpy could otherwise overtake it and a reader lapping this slot
  // would validate a torn frame (Boehm seqlock writer idiom).
  std::atomic_thread_fence(std::memory_order_release);
  s->width = width;
  s->height = height;
  s->channels = channels;
  s->timestamp_ns = timestamp_ns;
  s->bytes = bytes;
  memcpy(reinterpret_cast<uint8_t*>(s) + sizeof(SlotHeader), data, bytes);
  s->end_seq.store(seq, std::memory_order_release);
  r->hdr->seq.store(seq, std::memory_order_release);
  return seq;
}

// Copy the newest frame (if newer than last_seq) into out.  Returns the
// frame seq, 0 if nothing newer, or (uint64_t)-1 if it did not fit / torn.
uint64_t d2s_ring_read_latest(void* handle, uint8_t* out, uint32_t out_cap,
                              uint32_t* width, uint32_t* height,
                              uint32_t* channels, uint64_t* timestamp_ns,
                              uint64_t last_seq) {
  Ring* r = reinterpret_cast<Ring*>(handle);
  for (int attempt = 0; attempt < 4; ++attempt) {
    uint64_t seq = r->hdr->seq.load(std::memory_order_acquire);
    if (seq == 0 || seq <= last_seq) return 0;
    SlotHeader* s = slot_at(r, seq);
    if (s->end_seq.load(std::memory_order_acquire) != seq) continue;  // mid-write
    uint32_t bytes = s->bytes;
    if (bytes > out_cap) return (uint64_t)-1;
    uint32_t w = s->width, h = s->height, c = s->channels;
    uint64_t ts = s->timestamp_ns;
    memcpy(out, reinterpret_cast<uint8_t*>(s) + sizeof(SlotHeader), bytes);
    // LoadLoad fence: the payload copy above must complete before the
    // validating re-reads below — without it the loads can be reordered
    // past the checks and a torn copy passes validation (Boehm seqlock
    // reader idiom: fence between data reads and the sequence re-read).
    std::atomic_thread_fence(std::memory_order_acquire);
    // seqlock validate: the slot must not have been recycled mid-copy
    if (s->start_seq.load(std::memory_order_relaxed) == seq &&
        s->end_seq.load(std::memory_order_relaxed) == seq) {
      *width = w;
      *height = h;
      *channels = c;
      *timestamp_ns = ts;
      return seq;
    }
  }
  return (uint64_t)-1;
}

uint64_t d2s_ring_latest_seq(void* handle) {
  Ring* r = reinterpret_cast<Ring*>(handle);
  return r->hdr->seq.load(std::memory_order_acquire);
}

uint32_t d2s_ring_max_bytes(void* handle) {
  return reinterpret_cast<Ring*>(handle)->hdr->max_bytes;
}

void d2s_ring_close(void* handle) {
  Ring* r = reinterpret_cast<Ring*>(handle);
  munmap(r->base, r->map_bytes);
  close(r->fd);
  if (r->owner) shm_unlink(r->name);
  delete r;
}

// ---------------------------------------------------------------------------
// X11 capture (libX11 via dlopen; optional XShm fast path via libXext)
// ---------------------------------------------------------------------------

struct XImageLike {  // prefix-compatible with Xlib's XImage
  int width, height;
  int xoffset;
  int format;
  char* data;
  int byte_order;
  int bitmap_unit;
  int bitmap_bit_order;
  int bitmap_pad;
  int depth;
  int bytes_per_line;
  int bits_per_pixel;
  // ... (remaining fields unused)
};

typedef void* (*XOpenDisplayFn)(const char*);
typedef int (*XCloseDisplayFn)(void*);
typedef int (*XErrorHandlerFn)(void*, void*);
typedef XErrorHandlerFn (*XSetErrorHandlerFn)(XErrorHandlerFn);

// Xlib's default error handler EXITS the process on async errors like
// BadWindow — which a tracked window produces the instant it is closed,
// making screen.py's "window gone → re-find" path unreachable.  Swallow
// errors instead; calls after a failure return 0/None and the Python layer
// recovers (reference capture.py handles device-lost the same way).
static int d2s_ignore_x_error(void*, void*) { return 0; }
typedef unsigned long (*XDefaultRootWindowFn)(void*);
typedef int (*XDefaultScreenFn)(void*);
typedef int (*XDisplayWidthFn)(void*, int);
typedef int (*XDisplayHeightFn)(void*, int);
typedef XImageLike* (*XGetImageFn)(void*, unsigned long, int, int,
                                   unsigned int, unsigned int, unsigned long,
                                   int);
typedef int (*XDestroyImageFn)(XImageLike*);
typedef int (*XQueryTreeFn)(void*, unsigned long, unsigned long*,
                            unsigned long*, unsigned long**, unsigned int*);
typedef int (*XFetchNameFn)(void*, unsigned long, char**);
typedef int (*XFreeFn)(void*);
typedef unsigned long (*XInternAtomFn)(void*, const char*, int);
typedef int (*XGetWindowPropertyFn)(void*, unsigned long, unsigned long, long,
                                    long, int, unsigned long, unsigned long*,
                                    int*, unsigned long*, unsigned long*,
                                    unsigned char**);
typedef int (*XGetWindowAttributesFn)(void*, unsigned long, void*);
typedef int (*XTranslateCoordinatesFn)(void*, unsigned long, unsigned long,
                                       int, int, int*, int*, unsigned long*);

// XWindowAttributes prefix (stable public Xlib ABI) up to map_state, which
// distinguishes hidden windows (apps keep unmapped same-titled auxiliaries;
// matching one captures a stale/zero rect).  IsViewable == 2.
struct XWindowAttributesLike {
  int x, y;
  int width, height;
  int border_width;
  int depth;
  void* visual;
  unsigned long root;
  int win_class;
  int bit_gravity, win_gravity, backing_store;
  unsigned long backing_planes, backing_pixel;
  int save_under;
  unsigned long colormap;
  int map_installed;
  int map_state;
  char tail[96];  // event masks, do-not-propagate, override, screen ptr
};
static const int kIsViewable = 2;

// XFixesGetCursorImage result (prefix-compatible with Xfixes.h; on LP64 the
// per-pixel elements are unsigned LONG with ARGB in the low 32 bits).
struct XFixesCursorImageLike {
  short x, y;
  unsigned short width, height;
  unsigned short xhot, yhot;
  unsigned long cursor_serial;
  unsigned long* pixels;
  unsigned long atom;
  const char* name;
};
typedef XFixesCursorImageLike* (*XFixesGetCursorImageFn)(void*);

struct X11Cap {
  void* lib;
  void* xfixes_lib;  // may be null
  void* dpy;
  unsigned long root;
  int width, height;
  XGetImageFn get_image;
  XDestroyImageFn destroy_image;
  XQueryTreeFn query_tree;
  XFetchNameFn fetch_name;
  XFreeFn x_free;
  XInternAtomFn intern_atom;
  XGetWindowPropertyFn get_property;
  XGetWindowAttributesFn get_attributes;
  XTranslateCoordinatesFn translate;
  XFixesGetCursorImageFn get_cursor;
};

void* d2s_x11_open(const char* display_name) {
  void* lib = dlopen("libX11.so.6", RTLD_LAZY | RTLD_LOCAL);
  if (!lib) lib = dlopen("libX11.so", RTLD_LAZY | RTLD_LOCAL);
  if (!lib) return nullptr;
  auto open_display = (XOpenDisplayFn)dlsym(lib, "XOpenDisplay");
  auto default_root = (XDefaultRootWindowFn)dlsym(lib, "XDefaultRootWindow");
  auto default_screen = (XDefaultScreenFn)dlsym(lib, "XDefaultScreen");
  auto disp_w = (XDisplayWidthFn)dlsym(lib, "XDisplayWidth");
  auto disp_h = (XDisplayHeightFn)dlsym(lib, "XDisplayHeight");
  auto get_image = (XGetImageFn)dlsym(lib, "XGetImage");
  auto destroy_image = (XDestroyImageFn)dlsym(lib, "XDestroyImage");
  if (!open_display || !default_root || !get_image) {
    dlclose(lib);
    return nullptr;
  }
  void* dpy = open_display(display_name && display_name[0] ? display_name
                                                           : nullptr);
  if (!dpy) {
    dlclose(lib);
    return nullptr;
  }
  auto set_err = (XSetErrorHandlerFn)dlsym(lib, "XSetErrorHandler");
  if (set_err) set_err(d2s_ignore_x_error);
  X11Cap* cap = new X11Cap();
  cap->lib = lib;
  cap->dpy = dpy;
  cap->root = default_root(dpy);
  int screen = default_screen ? default_screen(dpy) : 0;
  cap->width = disp_w ? disp_w(dpy, screen) : 0;
  cap->height = disp_h ? disp_h(dpy, screen) : 0;
  cap->get_image = get_image;
  cap->destroy_image = destroy_image;
  cap->query_tree = (XQueryTreeFn)dlsym(lib, "XQueryTree");
  cap->fetch_name = (XFetchNameFn)dlsym(lib, "XFetchName");
  cap->x_free = (XFreeFn)dlsym(lib, "XFree");
  cap->intern_atom = (XInternAtomFn)dlsym(lib, "XInternAtom");
  cap->get_property = (XGetWindowPropertyFn)dlsym(lib, "XGetWindowProperty");
  cap->get_attributes =
      (XGetWindowAttributesFn)dlsym(lib, "XGetWindowAttributes");
  cap->translate =
      (XTranslateCoordinatesFn)dlsym(lib, "XTranslateCoordinates");
  cap->xfixes_lib = dlopen("libXfixes.so.3", RTLD_LAZY | RTLD_LOCAL);
  if (!cap->xfixes_lib)
    cap->xfixes_lib = dlopen("libXfixes.so", RTLD_LAZY | RTLD_LOCAL);
  cap->get_cursor =
      cap->xfixes_lib
          ? (XFixesGetCursorImageFn)dlsym(cap->xfixes_lib,
                                          "XFixesGetCursorImage")
          : nullptr;
  return cap;
}

// Case-insensitive substring window search over the tree (the reference's
// window-title mode, reference capture.py:39-247).  Checks _NET_WM_NAME
// (UTF-8) then WM_NAME.  Returns the window id or 0.
static bool name_matches(const char* name, const char* needle_lower) {
  if (!name || !needle_lower[0]) return false;
  size_t nl = strlen(name), ql = strlen(needle_lower);
  if (ql > nl) return false;
  for (size_t i = 0; i + ql <= nl; ++i) {
    size_t j = 0;
    for (; j < ql; ++j) {
      char c = name[i + j];
      if (c >= 'A' && c <= 'Z') c += 32;
      if (c != needle_lower[j]) break;
    }
    if (j == ql) return true;
  }
  return false;
}

static bool window_viewable(X11Cap* cap, unsigned long win) {
  if (!cap->get_attributes) return true;  // can't tell — accept
  XWindowAttributesLike attrs;
  memset(&attrs, 0, sizeof(attrs));
  if (!cap->get_attributes(cap->dpy, win, &attrs)) return false;
  return attrs.map_state == kIsViewable && attrs.width > 1 && attrs.height > 1;
}

static unsigned long find_window_rec(X11Cap* cap, unsigned long win,
                                     const char* needle_lower,
                                     unsigned long net_wm_name,
                                     unsigned long utf8, int depth) {
  if (depth > 12) return 0;
  // _NET_WM_NAME first (modern WMs), then legacy WM_NAME; only VIEWABLE
  // windows count — apps keep hidden same-titled auxiliaries whose rects
  // are stale (finding 7 of the round-2 review).
  if (cap->get_property) {
    unsigned long type = 0, nitems = 0, after = 0;
    int fmt = 0;
    unsigned char* prop = nullptr;
    if (cap->get_property(cap->dpy, win, net_wm_name, 0, 1024, 0, utf8,
                          &type, &fmt, &nitems, &after, &prop) == 0 &&
        prop) {
      bool hit = name_matches(reinterpret_cast<char*>(prop), needle_lower);
      cap->x_free(prop);
      if (hit && window_viewable(cap, win)) return win;
    }
  }
  if (cap->fetch_name) {
    char* name = nullptr;
    if (cap->fetch_name(cap->dpy, win, &name) && name) {
      bool hit = name_matches(name, needle_lower);
      cap->x_free(name);
      if (hit && window_viewable(cap, win)) return win;
    }
  }
  if (!cap->query_tree) return 0;
  unsigned long root = 0, parent = 0;
  unsigned long* children = nullptr;
  unsigned int n = 0;
  if (!cap->query_tree(cap->dpy, win, &root, &parent, &children, &n))
    return 0;
  unsigned long found = 0;
  for (unsigned int i = 0; i < n && !found; ++i)
    found = find_window_rec(cap, children[i], needle_lower, net_wm_name,
                            utf8, depth + 1);
  if (children) cap->x_free(children);
  return found;
}

uint64_t d2s_x11_find_window(void* handle, const char* title_substr) {
  X11Cap* cap = reinterpret_cast<X11Cap*>(handle);
  if (!cap->query_tree || !cap->x_free || !title_substr || !title_substr[0])
    return 0;
  char needle[256];
  size_t n = strlen(title_substr);
  if (n >= sizeof(needle)) n = sizeof(needle) - 1;
  for (size_t i = 0; i < n; ++i) {
    char c = title_substr[i];
    needle[i] = (c >= 'A' && c <= 'Z') ? c + 32 : c;
  }
  needle[n] = 0;
  unsigned long net_wm_name = 0, utf8 = 0;
  if (cap->intern_atom) {
    net_wm_name = cap->intern_atom(cap->dpy, "_NET_WM_NAME", 1);
    utf8 = cap->intern_atom(cap->dpy, "UTF8_STRING", 1);
  }
  return find_window_rec(cap, cap->root, needle, net_wm_name, utf8, 0);
}

// Window geometry in root coordinates (XGetWindowAttributes size +
// XTranslateCoordinates origin).  Returns 0 on ok; rect is clamped to the
// screen by the caller.
int d2s_x11_window_rect(void* handle, uint64_t window, int* x, int* y,
                        int* w, int* h) {
  X11Cap* cap = reinterpret_cast<X11Cap*>(handle);
  if (!cap->get_attributes || !cap->translate) return -1;
  XWindowAttributesLike attrs;
  memset(&attrs, 0, sizeof(attrs));
  if (!cap->get_attributes(cap->dpy, window, &attrs)) return -2;
  if (attrs.map_state != kIsViewable) return -4;  // hidden → treat as gone
  int rx = 0, ry = 0;
  unsigned long child = 0;
  if (!cap->translate(cap->dpy, window, cap->root, 0, 0, &rx, &ry, &child))
    return -3;
  *x = rx;
  *y = ry;
  *w = attrs.width;
  *h = attrs.height;
  return 0;
}

// Window-title enumeration for the control panel's capture dropdown (the
// reference GUI's window list, reference gui.py:376-470).  Prefers the
// window manager's _NET_CLIENT_LIST (top-level app windows only, in
// stacking order); falls back to a viewable-named-window tree walk on WMs
// without EWMH.  Writes titles separated by '\n' (NUL-terminated) into
// `out`; returns the number of titles written.
static void append_title(X11Cap* cap, unsigned long win,
                         unsigned long net_wm_name, unsigned long utf8,
                         char* out, uint32_t cap_bytes, uint32_t* used,
                         uint32_t* count) {
  if (!window_viewable(cap, win)) return;
  unsigned char* prop_title = nullptr;  // _NET_WM_NAME (UTF-8)
  char* fetched = nullptr;              // legacy WM_NAME
  const char* title = nullptr;
  if (cap->get_property && net_wm_name) {
    unsigned long type = 0, nitems = 0, after = 0;
    int fmt = 0;
    if (cap->get_property(cap->dpy, win, net_wm_name, 0, 1024, 0, utf8,
                          &type, &fmt, &nitems, &after, &prop_title) != 0)
      prop_title = nullptr;
    if (prop_title && prop_title[0])
      title = reinterpret_cast<char*>(prop_title);
  }
  if (!title && cap->fetch_name &&
      cap->fetch_name(cap->dpy, win, &fetched) && fetched && fetched[0])
    title = fetched;
  if (title) {
    size_t len = strlen(title);
    if (len > 512) len = 512;
    if (*used + len + 2 < cap_bytes) {
      if (*count) out[(*used)++] = '\n';
      // '\n' is the record separator, but X11 titles are arbitrary bytes
      // and may themselves contain control characters — a newline inside
      // a title would split it into bogus dropdown entries.  Replace all
      // C0 control bytes with spaces (UTF-8 continuation bytes are >=0x80
      // and pass through untouched).
      for (size_t i = 0; i < len; ++i) {
        unsigned char c = static_cast<unsigned char>(title[i]);
        out[*used + i] = (c < 0x20) ? ' ' : title[i];
      }
      *used += static_cast<uint32_t>(len);
      out[*used] = 0;
      (*count)++;
    }
  }
  if (prop_title) cap->x_free(prop_title);
  if (fetched) cap->x_free(fetched);
}

static void list_windows_rec(X11Cap* cap, unsigned long win,
                             unsigned long net_wm_name, unsigned long utf8,
                             char* out, uint32_t cap_bytes, uint32_t* used,
                             uint32_t* count, int depth) {
  if (depth > 12) return;
  append_title(cap, win, net_wm_name, utf8, out, cap_bytes, used, count);
  if (!cap->query_tree) return;
  unsigned long root = 0, parent = 0;
  unsigned long* children = nullptr;
  unsigned int n = 0;
  if (!cap->query_tree(cap->dpy, win, &root, &parent, &children, &n)) return;
  for (unsigned int i = 0; i < n; ++i)
    list_windows_rec(cap, children[i], net_wm_name, utf8, out, cap_bytes,
                     used, count, depth + 1);
  if (children) cap->x_free(children);
}

uint32_t d2s_x11_list_windows(void* handle, char* out, uint32_t cap_bytes) {
  X11Cap* cap = reinterpret_cast<X11Cap*>(handle);
  if (!out || cap_bytes < 2 || !cap->x_free) return 0;
  out[0] = 0;
  uint32_t used = 0, count = 0;
  unsigned long net_wm_name = 0, utf8 = 0, client_list = 0;
  if (cap->intern_atom) {
    net_wm_name = cap->intern_atom(cap->dpy, "_NET_WM_NAME", 1);
    utf8 = cap->intern_atom(cap->dpy, "UTF8_STRING", 1);
    client_list = cap->intern_atom(cap->dpy, "_NET_CLIENT_LIST", 1);
  }
  if (cap->get_property && client_list) {
    unsigned long type = 0, nitems = 0, after = 0;
    int fmt = 0;
    unsigned char* prop = nullptr;
    if (cap->get_property(cap->dpy, cap->root, client_list, 0, 4096, 0,
                          33 /* XA_WINDOW */, &type, &fmt, &nitems, &after,
                          &prop) == 0 &&
        prop && fmt == 32 && nitems > 0) {
      unsigned long* wins = reinterpret_cast<unsigned long*>(prop);
      for (unsigned long i = 0; i < nitems; ++i)
        append_title(cap, wins[i], net_wm_name, utf8, out, cap_bytes, &used,
                     &count);
      cap->x_free(prop);
      return count;
    }
    if (prop) cap->x_free(prop);
  }
  list_windows_rec(cap, cap->root, net_wm_name, utf8, out, cap_bytes, &used,
                   &count, 0);
  return count;
}

// Cursor snapshot via XFixes: ARGB pixels + hotspot + root position.
// Returns 0 on ok, <0 if XFixes is unavailable or the image doesn't fit.
int d2s_x11_cursor(void* handle, uint32_t* out_argb, uint32_t cap_pixels,
                   int* x, int* y, int* xhot, int* yhot, int* w, int* h) {
  X11Cap* cap = reinterpret_cast<X11Cap*>(handle);
  if (!cap->get_cursor) return -1;
  XFixesCursorImageLike* img = cap->get_cursor(cap->dpy);
  if (!img) return -2;
  uint32_t n = (uint32_t)img->width * img->height;
  if (n > cap_pixels) {
    if (cap->x_free) cap->x_free(img);
    return -3;
  }
  for (uint32_t i = 0; i < n; ++i)
    out_argb[i] = (uint32_t)(img->pixels[i] & 0xffffffffu);
  *x = img->x;
  *y = img->y;
  *xhot = img->xhot;
  *yhot = img->yhot;
  *w = img->width;
  *h = img->height;
  if (cap->x_free) cap->x_free(img);
  return 0;
}

int d2s_x11_size(void* handle, int* width, int* height) {
  X11Cap* cap = reinterpret_cast<X11Cap*>(handle);
  *width = cap->width;
  *height = cap->height;
  return 0;
}

// Grab a root-window region as BGRA into out (w*h*4 bytes).  Returns 0 on
// ok.  Window mode = region-of-desktop at the tracked window's rect
// (the reference re-targets its desktop grabber the same way, reference
// capture.py:159-217).
int d2s_x11_grab_rect(void* handle, uint8_t* out, int x, int y, int w, int h) {
  X11Cap* cap = reinterpret_cast<X11Cap*>(handle);
  const unsigned long kAllPlanes = ~0UL;
  const int kZPixmap = 2;
  XImageLike* img =
      cap->get_image(cap->dpy, cap->root, x, y, (unsigned)w, (unsigned)h,
                     kAllPlanes, kZPixmap);
  if (!img) return -1;
  if (img->bits_per_pixel == 32) {
    for (int y = 0; y < h && y < img->height; ++y) {
      memcpy(out + (size_t)y * w * 4,
             img->data + (size_t)y * img->bytes_per_line, (size_t)w * 4);
    }
  } else if (img->bits_per_pixel == 24) {
    for (int y = 0; y < h && y < img->height; ++y) {
      const uint8_t* src =
          reinterpret_cast<uint8_t*>(img->data) + (size_t)y * img->bytes_per_line;
      uint8_t* dst = out + (size_t)y * w * 4;
      for (int x = 0; x < w; ++x) {
        dst[4 * x + 0] = src[3 * x + 0];
        dst[4 * x + 1] = src[3 * x + 1];
        dst[4 * x + 2] = src[3 * x + 2];
        dst[4 * x + 3] = 255;
      }
    }
  } else {
    if (cap->destroy_image) cap->destroy_image(img);
    return -2;
  }
  if (cap->destroy_image) cap->destroy_image(img);
  return 0;
}

// Full-screen grab (back-compat entry point).
int d2s_x11_grab(void* handle, uint8_t* out, int w, int h) {
  return d2s_x11_grab_rect(handle, out, 0, 0, w, h);
}

void d2s_x11_close(void* handle) {
  X11Cap* cap = reinterpret_cast<X11Cap*>(handle);
  auto close_display = (XCloseDisplayFn)dlsym(cap->lib, "XCloseDisplay");
  if (close_display) close_display(cap->dpy);
  if (cap->xfixes_lib) dlclose(cap->xfixes_lib);
  dlclose(cap->lib);
  delete cap;
}

// ---------------------------------------------------------------------------
// OS input injection: XTest fake events (libXtst via dlopen)
//
// The Linux analog of the reference's SendInput/InjectTouchInput path
// (reference xr_viewer/input.py:121-390): the XR client's laser cursor,
// clicks, scroll ticks and virtual-keyboard presses arrive over the frame
// protocol's input channel and are replayed into the X session that the
// capture grabs — closing the drive-the-desktop-from-the-headset loop.
// ---------------------------------------------------------------------------

typedef int (*XTestQueryExtensionFn)(void*, int*, int*, int*, int*);
typedef int (*XTestFakeMotionEventFn)(void*, int, int, int, unsigned long);
typedef int (*XTestFakeButtonEventFn)(void*, unsigned int, int, unsigned long);
typedef int (*XTestFakeKeyEventFn)(void*, unsigned int, int, unsigned long);
typedef unsigned char (*XKeysymToKeycodeFn)(void*, unsigned long);
typedef int (*XFlushFn)(void*);

struct InputInj {
  void* x11_lib;
  void* xtst_lib;
  void* dpy;
  XTestFakeMotionEventFn motion;
  XTestFakeButtonEventFn button;
  XTestFakeKeyEventFn key;
  XKeysymToKeycodeFn keysym_to_keycode;
  XFlushFn flush;
  XCloseDisplayFn close_display;
  int screen_w, screen_h;
};

void* d2s_input_open(const char* display) {
  void* x11 = dlopen("libX11.so.6", RTLD_LAZY | RTLD_LOCAL);
  if (!x11) x11 = dlopen("libX11.so", RTLD_LAZY | RTLD_LOCAL);
  if (!x11) return nullptr;
  void* xtst = dlopen("libXtst.so.6", RTLD_LAZY | RTLD_LOCAL);
  if (!xtst) xtst = dlopen("libXtst.so", RTLD_LAZY | RTLD_LOCAL);
  if (!xtst) {
    dlclose(x11);
    return nullptr;
  }
  auto open_display = (XOpenDisplayFn)dlsym(x11, "XOpenDisplay");
  auto query = (XTestQueryExtensionFn)dlsym(xtst, "XTestQueryExtension");
  auto motion = (XTestFakeMotionEventFn)dlsym(xtst, "XTestFakeMotionEvent");
  auto button = (XTestFakeButtonEventFn)dlsym(xtst, "XTestFakeButtonEvent");
  auto key = (XTestFakeKeyEventFn)dlsym(xtst, "XTestFakeKeyEvent");
  auto k2k = (XKeysymToKeycodeFn)dlsym(x11, "XKeysymToKeycode");
  auto flush = (XFlushFn)dlsym(x11, "XFlush");
  auto close_display = (XCloseDisplayFn)dlsym(x11, "XCloseDisplay");
  auto default_screen = (XDefaultScreenFn)dlsym(x11, "XDefaultScreen");
  auto disp_w = (XDisplayWidthFn)dlsym(x11, "XDisplayWidth");
  auto disp_h = (XDisplayHeightFn)dlsym(x11, "XDisplayHeight");
  if (!open_display || !query || !motion || !button || !key || !k2k ||
      !flush || !close_display) {
    dlclose(xtst);
    dlclose(x11);
    return nullptr;
  }
  void* dpy = open_display(display && display[0] ? display : nullptr);
  if (!dpy) {
    dlclose(xtst);
    dlclose(x11);
    return nullptr;
  }
  int ev, err, maj, min_;
  if (!query(dpy, &ev, &err, &maj, &min_)) {
    close_display(dpy);
    dlclose(xtst);
    dlclose(x11);
    return nullptr;
  }
  InputInj* inj = new InputInj();
  inj->x11_lib = x11;
  inj->xtst_lib = xtst;
  inj->dpy = dpy;
  inj->motion = motion;
  inj->button = button;
  inj->key = key;
  inj->keysym_to_keycode = k2k;
  inj->flush = flush;
  inj->close_display = close_display;
  int scr = default_screen ? default_screen(dpy) : 0;
  inj->screen_w = disp_w ? disp_w(dpy, scr) : 0;
  inj->screen_h = disp_h ? disp_h(dpy, scr) : 0;
  return inj;
}

void d2s_input_screen_size(void* handle, int* w, int* h) {
  InputInj* inj = reinterpret_cast<InputInj*>(handle);
  if (w) *w = inj->screen_w;
  if (h) *h = inj->screen_h;
}

int d2s_input_move(void* handle, int x, int y) {
  InputInj* inj = reinterpret_cast<InputInj*>(handle);
  if (!inj->motion(inj->dpy, -1 /* current screen */, x, y, 0)) return -1;
  inj->flush(inj->dpy);
  return 0;
}

// button: 1 left, 2 middle, 3 right, 4/5 wheel up/down, 6/7 wheel left/right
int d2s_input_button(void* handle, int button, int down) {
  InputInj* inj = reinterpret_cast<InputInj*>(handle);
  if (!inj->button(inj->dpy, (unsigned int)button, down ? 1 : 0, 0))
    return -1;
  inj->flush(inj->dpy);
  return 0;
}

// keysym: X11 keysym (the Python shim maps the keyboard layer's VK codes)
int d2s_input_key(void* handle, uint32_t keysym, int down) {
  InputInj* inj = reinterpret_cast<InputInj*>(handle);
  unsigned char code = inj->keysym_to_keycode(inj->dpy, (unsigned long)keysym);
  if (code == 0) return -2;
  if (!inj->key(inj->dpy, code, down ? 1 : 0, 0)) return -1;
  inj->flush(inj->dpy);
  return 0;
}

void d2s_input_close(void* handle) {
  InputInj* inj = reinterpret_cast<InputInj*>(handle);
  inj->close_display(inj->dpy);
  dlclose(inj->xtst_lib);
  dlclose(inj->x11_lib);
  delete inj;
}

// ---------------------------------------------------------------------------
// uinput multitouch injection
//
// The reference's two-trigger pinch injects REAL touch events on Windows
// (InjectTouchInput, reference xr_viewer/input.py:121-390) — apps that
// distinguish touch from ctrl+wheel (maps, browsers, photo viewers) zoom
// smoothly instead of in wheel steps.  XTest cannot fake touch; Linux
// uinput can: this creates a virtual direct-touch device (type-B slot
// protocol) sized to the captured screen.  Requires /dev/uinput write
// access (udev/group or root); the Python shim degrades to ctrl+wheel
// synthesis when open fails.
// ---------------------------------------------------------------------------

#define D2S_TOUCH_SLOTS 10

struct UinputTouch {
  int fd;
  int tracking[D2S_TOUCH_SLOTS];  // -1 = slot free
  int next_id;
  int contacts;
};

static int uinput_emit(int fd, uint16_t type, uint16_t code, int32_t value) {
  struct input_event ev;
  memset(&ev, 0, sizeof(ev));
  ev.type = type;
  ev.code = code;
  ev.value = value;
  return write(fd, &ev, sizeof(ev)) == (ssize_t)sizeof(ev) ? 0 : -1;
}

void* d2s_touch_open(int screen_w, int screen_h) {
  int fd = open("/dev/uinput", O_WRONLY | O_NONBLOCK);
  if (fd < 0) return nullptr;
  if (ioctl(fd, UI_SET_EVBIT, EV_KEY) < 0 ||
      ioctl(fd, UI_SET_EVBIT, EV_ABS) < 0 ||
      ioctl(fd, UI_SET_EVBIT, EV_SYN) < 0 ||
      ioctl(fd, UI_SET_KEYBIT, BTN_TOUCH) < 0 ||
      ioctl(fd, UI_SET_PROPBIT, INPUT_PROP_DIRECT) < 0) {
    close(fd);
    return nullptr;
  }
  struct uinput_abs_setup abs;
  const struct { uint16_t code; int max; } axes[] = {
      {ABS_MT_SLOT, D2S_TOUCH_SLOTS - 1},
      {ABS_MT_TRACKING_ID, 65535},
      {ABS_MT_POSITION_X, screen_w > 1 ? screen_w - 1 : 1},
      {ABS_MT_POSITION_Y, screen_h > 1 ? screen_h - 1 : 1},
      // single-touch mirrors so legacy pointer emulation works
      {ABS_X, screen_w > 1 ? screen_w - 1 : 1},
      {ABS_Y, screen_h > 1 ? screen_h - 1 : 1},
  };
  for (const auto& ax : axes) {
    memset(&abs, 0, sizeof(abs));
    abs.code = ax.code;
    abs.absinfo.minimum = 0;
    abs.absinfo.maximum = ax.max;
    if (ioctl(fd, UI_ABS_SETUP, &abs) < 0) {
      close(fd);
      return nullptr;
    }
  }
  struct uinput_setup setup;
  memset(&setup, 0, sizeof(setup));
  setup.id.bustype = BUS_VIRTUAL;
  setup.id.vendor = 0xd25;
  setup.id.product = 0x7001;
  snprintf(setup.name, sizeof(setup.name), "d2s-virtual-touchscreen");
  if (ioctl(fd, UI_DEV_SETUP, &setup) < 0 ||
      ioctl(fd, UI_DEV_CREATE) < 0) {
    close(fd);
    return nullptr;
  }
  UinputTouch* t = new UinputTouch();
  t->fd = fd;
  t->next_id = 1;
  t->contacts = 0;
  for (int i = 0; i < D2S_TOUCH_SLOTS; ++i) t->tracking[i] = -1;
  return t;
}

// One contact transition/move in the type-B slot protocol; call
// d2s_touch_frame() after the batch to SYN_REPORT the frame.
int d2s_touch_point(void* handle, int slot, int x, int y, int down) {
  UinputTouch* t = reinterpret_cast<UinputTouch*>(handle);
  if (slot < 0 || slot >= D2S_TOUCH_SLOTS) return -2;
  if (uinput_emit(t->fd, EV_ABS, ABS_MT_SLOT, slot) < 0) return -1;
  if (down) {
    if (t->tracking[slot] < 0) {
      t->tracking[slot] = t->next_id++ & 0xffff;
      if (uinput_emit(t->fd, EV_ABS, ABS_MT_TRACKING_ID,
                      t->tracking[slot]) < 0)
        return -1;
      if (++t->contacts == 1)
        uinput_emit(t->fd, EV_KEY, BTN_TOUCH, 1);
    }
    if (uinput_emit(t->fd, EV_ABS, ABS_MT_POSITION_X, x) < 0) return -1;
    if (uinput_emit(t->fd, EV_ABS, ABS_MT_POSITION_Y, y) < 0) return -1;
    // pointer-emulation mirror follows slot 0 ONLY: mirroring every
    // contact makes the legacy single-touch cursor jump between fingers
    // mid-pinch on desktops that consume the ST stream
    if (slot == 0) {
      uinput_emit(t->fd, EV_ABS, ABS_X, x);
      uinput_emit(t->fd, EV_ABS, ABS_Y, y);
    }
  } else if (t->tracking[slot] >= 0) {
    t->tracking[slot] = -1;
    if (uinput_emit(t->fd, EV_ABS, ABS_MT_TRACKING_ID, -1) < 0) return -1;
    if (t->contacts > 0 && --t->contacts == 0)
      uinput_emit(t->fd, EV_KEY, BTN_TOUCH, 0);
  }
  return 0;
}

int d2s_touch_frame(void* handle) {
  UinputTouch* t = reinterpret_cast<UinputTouch*>(handle);
  return uinput_emit(t->fd, EV_SYN, SYN_REPORT, 0);
}

void d2s_touch_close(void* handle) {
  UinputTouch* t = reinterpret_cast<UinputTouch*>(handle);
  // lift any contacts still down so the desktop never sees a stuck touch
  for (int i = 0; i < D2S_TOUCH_SLOTS; ++i)
    if (t->tracking[i] >= 0) d2s_touch_point(t, i, 0, 0, 0);
  d2s_touch_frame(t);
  ioctl(t->fd, UI_DEV_DESTROY);
  close(t->fd);
  delete t;
}

// ---------------------------------------------------------------------------
// Frame pacer: drift-free absolute deadlines
// ---------------------------------------------------------------------------

uint64_t d2s_now_ns(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (uint64_t)ts.tv_sec * 1000000000ull + (uint64_t)ts.tv_nsec;
}

// Sleep until *deadline_ns, then advance it by interval_ns.  If the deadline
// already slipped by more than one interval, resynchronize to now (drop the
// backlog — latest-frame-wins pacing, like the reference's 1/FPS loop).
// Returns the number of whole intervals skipped.
uint32_t d2s_pace(uint64_t* deadline_ns, uint64_t interval_ns) {
  uint64_t now = d2s_now_ns();
  uint32_t skipped = 0;
  if (*deadline_ns == 0) *deadline_ns = now + interval_ns;
  if (now > *deadline_ns + interval_ns) {
    skipped = (uint32_t)((now - *deadline_ns) / interval_ns);
    *deadline_ns = now + interval_ns;
  }
  struct timespec ts;
  ts.tv_sec = (time_t)(*deadline_ns / 1000000000ull);
  ts.tv_nsec = (long)(*deadline_ns % 1000000000ull);
  while (clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &ts, nullptr) == EINTR) {
  }
  *deadline_ns += interval_ns;
  return skipped;
}

}  // extern "C"
