// Native batched tennis-ball flight simulator.
//
// TPU-native framework's host-side runtime equivalent of the reference's
// *offline* Isaac Gym/PhysX ball farm (vid2player/utils/tennis_ball.py:113-356):
// the reference launches a 10k-env CUDA simulation to pre-generate trajectory
// pools and estimator tables. Here the offline path is a C++/OpenMP kernel —
// no accelerator needed, runs at asset-build time on any host — while the
// *online* path stays the jitted JAX integrator (tennis/ball.py
// simulate_flight). Both implement the identical force model so pools built
// natively are bit-compatible with on-device re-simulation up to float
// accumulation order:
//
//   drag   = -kf * CD * |v| * v                       (tennis_ball.py:158-181)
//   lift   = -kf * CL * |v|^2 * cross(v_tan, v_hat),  CL = 1/(2+|v|/(5*spin))
//            sign flipped for topspin; v_tan = cross(v_hat, -z)
//   bounce = COR-reflected vz + Coulomb tangential impulse at z <= R
//   net    = first y-sign-crossing must clear z = 1.07 m
//
// Build: g++ -O3 -fopenmp -shared -fPIC ballsim.cpp -o libballsim.so
// (driven by vid2player3d_tpu/native/ballsim.py via ctypes).

#include <cmath>
#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Params {
  float mass;
  float radius;
  float rho;
  float gravity;
  float base_cd;
  float restitution;
  float friction;
  float spin_scale;
  float net_height;
};

inline void cross3(const float* a, const float* b, float* out) {
  out[0] = a[1] * b[2] - a[2] * b[1];
  out[1] = a[2] * b[0] - a[0] * b[2];
  out[2] = a[0] * b[1] - a[1] * b[0];
}

}  // namespace

extern "C" {

// Simulate n balls for num_frames 30 Hz frames with `substeps` inner steps.
// Layouts (row-major float32):
//   pos0/vel0: (n,3)   vspin0: (n,)
//   traj:      (n, num_frames, 3)  position after each frame
//   bounce_pos:(n,3)  bounce_time:(n,)  max_h_after:(n,)
//   final_pos/final_vel: (n,3)  final_vspin: (n,)
//   has_bounce/pass_net: (n,) uint8
void ballsim_simulate(const float* pos0, const float* vel0,
                      const float* vspin0, int n, int num_frames,
                      int substeps, const Params* prm, float* traj,
                      float* bounce_pos, float* bounce_time,
                      float* max_h_after, float* final_pos, float* final_vel,
                      float* final_vspin, uint8_t* has_bounce,
                      uint8_t* pass_net) {
  const Params p = *prm;
  const float kf = p.rho * float(M_PI) * p.radius * p.radius * 0.5f;
  const float dt = (1.0f / 30.0f) / float(substeps);

#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    float pos[3] = {pos0[3 * i], pos0[3 * i + 1], pos0[3 * i + 2]};
    float vel[3] = {vel0[3 * i], vel0[3 * i + 1], vel0[3 * i + 2]};
    float vspin = vspin0[i];

    bool bounced = false, crossed_net = false, passed = false;
    float b_pos[3] = {0.f, 0.f, 0.f};
    float b_t = 0.f, max_h = 0.f, t = 0.f;

    for (int f = 0; f < num_frames; ++f) {
      for (int s = 0; s < substeps; ++s) {
        // aero: drag + Magnus lift
        const float speed =
            std::sqrt(vel[0] * vel[0] + vel[1] * vel[1] + vel[2] * vel[2]);
        const float inv = 1.0f / (speed + 1e-8f);
        const float vhat[3] = {vel[0] * inv, vel[1] * inv, vel[2] * inv};
        const float down[3] = {0.f, 0.f, -1.f};
        float vtan[3], lift_dir[3];
        cross3(vhat, down, vtan);
        cross3(vtan, vhat, lift_dir);
        float cl = 1.0f / (2.0f + std::fabs(speed / (std::fabs(vspin) *
                                                     p.spin_scale + 1e-6f)));
        if (vspin > 0.f) cl = -cl;
        float acc[3];
        for (int k = 0; k < 3; ++k) {
          const float drag = -kf * p.base_cd * speed * vel[k];
          const float lift = -kf * cl * speed * speed * lift_dir[k];
          acc[k] = (drag + lift) / p.mass;
        }
        acc[2] -= p.gravity;

        const float prev_y = pos[1];
        const float prev_z = pos[2];
        for (int k = 0; k < 3; ++k) vel[k] += acc[k] * dt;
        float new_pos[3];
        for (int k = 0; k < 3; ++k) new_pos[k] = pos[k] + vel[k] * dt;

        // net crossing (first y sign change must clear the tape)
        const bool crossed = (prev_y > 0.f) != (new_pos[1] > 0.f);
        if (crossed && !crossed_net) {
          const float w = std::fabs(prev_y) /
                          (std::fabs(prev_y - new_pos[1]) + 1e-8f);
          const float z_at_net = prev_z + w * (new_pos[2] - prev_z);
          passed = (z_at_net > p.net_height) && !bounced;
        }
        crossed_net = crossed_net || crossed;

        // ground bounce
        if (new_pos[2] <= p.radius) {
          const float vz = vel[2];
          const float jn = (1.0f + p.restitution) * std::fabs(vz);
          const float vt_norm =
              std::sqrt(vel[0] * vel[0] + vel[1] * vel[1]);
          const float dvt = std::min(p.friction * jn, vt_norm);
          const float scale = dvt / (vt_norm + 1e-8f);
          vel[0] -= scale * vel[0];
          vel[1] -= scale * vel[1];
          vel[2] = -p.restitution * vz;
          if (new_pos[2] < p.radius) new_pos[2] = p.radius;
          if (!bounced) {
            b_pos[0] = new_pos[0];
            b_pos[1] = new_pos[1];
            b_pos[2] = new_pos[2];
            b_t = t + dt;
            vspin = std::fabs(vspin);
          }
          bounced = true;
        }
        if (bounced && new_pos[2] > max_h) max_h = new_pos[2];
        t += dt;
        pos[0] = new_pos[0];
        pos[1] = new_pos[1];
        pos[2] = new_pos[2];
      }
      float* tp = traj + (size_t(i) * num_frames + f) * 3;
      tp[0] = pos[0];
      tp[1] = pos[1];
      tp[2] = pos[2];
    }

    bounce_pos[3 * i] = b_pos[0];
    bounce_pos[3 * i + 1] = b_pos[1];
    bounce_pos[3 * i + 2] = b_pos[2];
    bounce_time[i] = b_t;
    max_h_after[i] = max_h;
    final_pos[3 * i] = pos[0];
    final_pos[3 * i + 1] = pos[1];
    final_pos[3 * i + 2] = pos[2];
    final_vel[3 * i] = vel[0];
    final_vel[3 * i + 1] = vel[1];
    final_vel[3 * i + 2] = vel[2];
    final_vspin[i] = vspin;
    has_bounce[i] = bounced ? 1 : 0;
    pass_net[i] = passed ? 1 : 0;
  }
}

int ballsim_version() { return 1; }

}  // extern "C"
